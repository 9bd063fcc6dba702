"""Registry-wide physical-plan lint: structural antipatterns that the
spot checks in test_plans.py cover only for chosen queries are asserted
here for EVERY registered query.

Rules:
- No ``CartesianProduct`` anywhere. A genuine all-pairs exchange is the
  one plan shape that cannot survive 100 TB; every intentional tiny
  cross (scalar frames, domain×domain) must carry a broadcast hint so it
  plans as a broadcast loop instead.
- No ``BatchEvalPython`` (row-at-a-time Python UDF) except the Python
  UDTF coverage query — table functions have no Arrow evaluation mode,
  so ``udtf_char_bigrams`` is the documented exception. Everything else
  crosses the Python boundary via Arrow (ArrowEvalPython / mapInPandas /
  applyInPandas / applyInArrow).

``BroadcastNestedLoopJoin`` is deliberately NOT forbidden: with a 1-row
broadcast build side it is exactly the right plan for attaching scalar
aggregates, and the interval join requires it (test_plans.py asserts it
present).
"""

import pytest

pytestmark = pytest.mark.slow  # heavy sweep: excluded from the fast lane (pytest -m "not slow")

from etl_pipeline_for_retail_sales_data_spark.queries_registry import QUERIES

# Python UDTFs evaluate through BatchEvalPython by API design
ROW_PYTHON_OK = {"udtf_char_bigrams"}


# Sharded (round 5): keeps each slice under the 120s budget and a flake
# from costing the whole registry-wide pass. Round-robin over sorted
# names is deterministic and mixes families per shard.
N_SHARDS = 4


@pytest.mark.parametrize("shard", range(N_SHARDS))
def test_no_cartesian_product_and_no_row_python_registry_wide(spark, sf_smoke, shard):
    failures = []
    names = sorted(QUERIES)[shard::N_SHARDS]
    for name in names:
        fn = QUERIES[name]
        try:
            txt = fn(spark, sf_smoke)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 - report all at once
            failures.append(f"{name}: planning failed: {str(e).splitlines()[0][:120]}")
            continue
        if "CartesianProduct" in txt:
            failures.append(f"{name}: CartesianProduct in plan")
        if "BatchEvalPython" in txt and name not in ROW_PYTHON_OK:
            failures.append(f"{name}: row-at-a-time BatchEvalPython in plan")
        spark.catalog.clearCache()
    assert not failures, "plan lint violations:\n" + "\n".join(failures)
