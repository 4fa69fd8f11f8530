"""registry.pin: intermediate persists share their builder's LRU
lifetime — eviction unpersists them (the round-2 OOM class was raw
.persist() on intermediates outliving evicted builders)."""

from pyspark.sql import functions as F

from cs_pipeline_spark import registry


def test_pin_unpersists_on_eviction(spark, sf_dir):
    pinned = {}

    def builder(sess, sd):
        df = registry.pin(sess.range(10).select((F.col("id") * 2).alias("id")))
        pinned["df"] = df
        return df.agg(F.sum("id").alias("s"))

    key = ("__pin_test__", spark, sf_dir)
    stack = getattr(registry._PIN_STACK, "s", None)
    if stack is None:
        stack = []
        registry._PIN_STACK.s = stack
    stack.append(key)
    try:
        out = builder(spark, sf_dir)
    finally:
        stack.pop()
    registry._lru_put(key, out)
    assert out.count() == 1
    assert pinned["df"].storageLevel.useMemory  # pinned while live

    # flood the LRU to force eviction of our key
    for i in range(registry._PLAN_LRU_MAX + 2):
        registry._lru_put(
            (f"__flood_{i}__", spark, sf_dir), spark.range(1)
        )
    assert key not in registry._PLAN_LRU
    assert key not in registry._PINNED
    assert not pinned["df"].storageLevel.useMemory  # unpersisted


def test_pin_outside_builder_is_plain_persist(spark):
    df = registry.pin(spark.range(5))
    try:
        assert df.storageLevel.useMemory
    finally:
        df.unpersist(blocking=False)


def test_pinned_builders_still_hash_correct(spark, sf_dir):
    # the pinned multi-pass ops must return identical results on
    # repeated calls (cache hit) and fresh rebuilds (post-eviction)
    q = registry.queries()
    first = sorted(map(tuple, q["ml_decision_stump"](spark, sf_dir).collect()))
    again = sorted(map(tuple, q["ml_decision_stump"](spark, sf_dir).collect()))
    assert first == again
