"""Unit tests for planlint.single_partition_window_feeds — the tree
parser behind the registry-wide single-partition-window rule. Pinned on
synthetic plan strings shaped like Spark 4.1's toString output, so a
rendering change breaks loudly here rather than silently un-linting the
registry sweep."""

from etl_pipeline_for_retail_sales_data_spark.planlint import (
    single_partition_window_feeds,
)

# the exact defect shape r10 found in zipf_fit: unpartitioned
# row_number over the whole vocabulary
OLD_ZIPF = """\
AdaptiveSparkPlan isFinalPlan=false
+- HashAggregate(keys=[], functions=[count(1)])
   +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=10]
      +- HashAggregate(keys=[], functions=[partial_count(1)])
         +- Project [c#5L]
            +- Window [row_number() windowspecdefinition(c#5L DESC NULLS LAST, tok#4 ASC NULLS FIRST, specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())) AS r#9], [c#5L DESC NULLS LAST, tok#4 ASC NULLS FIRST]
               +- *(3) Sort [c#5L DESC NULLS LAST, tok#4 ASC NULLS FIRST], false, 0
                  +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=7]
                     +- HashAggregate(keys=[tok#4], functions=[count(1)])
"""

# a scalar aggregate's single-partition exchange — normal Spark, not a
# window funnel
SCALAR_AGG = """\
*(2) HashAggregate(keys=[], functions=[sum(x#1L)])
+- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=3]
   +- *(1) HashAggregate(keys=[], functions=[partial_sum(x#1L)])
      +- FileScan parquet [x#1L]
"""

# a PARTITIONED window: its exchange is hashpartitioning, and the only
# SinglePartition exchange belongs to a global limit above it
PARTITIONED_WINDOW = """\
GlobalLimit 10
+- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=9]
   +- LocalLimit 10
      +- Window [sum(v#2L) windowspecdefinition(k#1L, t#3 ASC NULLS FIRST, specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())) AS s#7L], [k#1L], [t#3 ASC NULLS FIRST]
         +- *(1) Sort [k#1L ASC NULLS FIRST, t#3 ASC NULLS FIRST], false, 0
            +- Exchange hashpartitioning(k#1L, 32), ENSURE_REQUIREMENTS, [plan_id=5]
               +- FileScan parquet [k#1L,v#2L,t#3]
"""

# AQE wrappers between the window's sort and the reused shuffle stage
AQE_WRAPPED = """\
Window [sum(c#2L) windowspecdefinition(b#1L ASC NULLS FIRST, specifiedwindowframe(RowFrame, unboundedpreceding$(), -1)) AS o#9L], [b#1L ASC NULLS FIRST]
+- *(2) Sort [b#1L ASC NULLS FIRST], false, 0
   +- AQEShuffleRead coalesced
      +- ShuffleQueryStage 0
         +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=4]
            +- HashAggregate(keys=[b#1L], functions=[sum(c#2L)])
"""

# binary-node rendering: the flagged exchange under a join's LEFT child
# (":" continuation prefixes) must still climb to its own window
JOIN_LEFT_CHILD = """\
*(5) BroadcastHashJoin [b#1L], [b#11L], Inner, BuildRight, false
:- Window [sum(c#2L) windowspecdefinition(b#1L ASC NULLS FIRST, specifiedwindowframe(RowFrame, unboundedpreceding$(), -1)) AS o#9L], [b#1L ASC NULLS FIRST]
:  +- *(3) Sort [b#1L ASC NULLS FIRST], false, 0
:     +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=4]
:        +- HashAggregate(keys=[b#1L], functions=[sum(c#2L)])
+- BroadcastExchange HashedRelationBroadcastMode(List(input[0, bigint, false])), [plan_id=8]
   +- FileScan parquet [b#11L]
"""


# review catch (r11): a SORT-BASED final aggregate over a single-
# partition exchange is normal Spark, exactly like its hash sibling —
# "Sort" as a bare prefix would swallow SortAggregate/SortMergeJoin and
# climb through a BOUNDING consumer to a window above it
SORT_AGGREGATE = """\
Window [sum(s#9L) windowspecdefinition(k#1L, specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())) AS o#12L], [k#1L]
+- SortAggregate(key=[], functions=[collect_list(v#2L, 0, 0)])
   +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=6]
      +- SortAggregate(key=[], functions=[partial_collect_list(v#2L, 0, 0)])
         +- FileScan parquet [v#2L]
"""

SORT_MERGE_JOIN = """\
Window [sum(v#2L) windowspecdefinition(k#1L, t#3 ASC NULLS FIRST, specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())) AS s#7L], [k#1L], [t#3 ASC NULLS FIRST]
+- *(4) SortMergeJoin [k#1L], [k#11L], Inner
   :- *(1) Sort [k#1L ASC NULLS FIRST], false, 0
   :  +- Exchange hashpartitioning(k#1L, 32), ENSURE_REQUIREMENTS, [plan_id=3]
   :     +- FileScan parquet [k#1L,v#2L,t#3]
   +- *(2) Sort [k#11L ASC NULLS FIRST], false, 0
      +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=5]
         +- FileScan parquet [k#11L]
"""


def test_sort_named_consumers_are_not_pass_through():
    assert single_partition_window_feeds(SORT_AGGREGATE) == []
    assert single_partition_window_feeds(SORT_MERGE_JOIN) == []


def test_flags_unpartitioned_rank_window():
    hits = single_partition_window_feeds(OLD_ZIPF)
    assert len(hits) == 1 and "row_number" in hits[0]


def test_scalar_aggregate_not_flagged():
    assert single_partition_window_feeds(SCALAR_AGG) == []


def test_partitioned_window_and_global_limit_not_flagged():
    assert single_partition_window_feeds(PARTITIONED_WINDOW) == []


def test_climbs_through_aqe_wrappers():
    hits = single_partition_window_feeds(AQE_WRAPPED)
    assert len(hits) == 1 and hits[0].startswith("Window")


def test_join_child_indentation_resolves_to_window():
    hits = single_partition_window_feeds(JOIN_LEFT_CHILD)
    assert len(hits) == 1 and hits[0].startswith("Window")
