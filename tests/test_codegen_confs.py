"""ensure_codegen_confs: the huge-method codegen fallback for vanilla
sessions.

HotSpot never JIT-compiles methods over 8000 bytecode bytes
(DontCompileHugeMethods defaults true in every stock JVM), and Spark's
default spark.sql.codegen.hugeMethodLimit=65535 keeps whole-stage-fused
methods far past that line — so in a session WITHOUT the engine's
-XX:-DontCompileHugeMethods flag (a user's own builder, the scale
sweep's vanilla 1 GB driver, the external correctness driver) the
similarity family's fused 64-dim dot-product loops run INTERPRETED
(measured 133.1s vs 17.3s on ext_similarity_ivf at sf1.0, identical
values/hashes). operators.common.t() routes every operator through
session.ensure_codegen_confs, which lowers the limit to 8000 exactly
when no JVM in the job carries the flag, making WSCG fall back to
un-fused operators whose expression codegen splits into JIT-able ~1 KB
methods.
"""

from pyspark.sql import functions as F

from relational_to_doc_oriented_nosql_migrator_spark.session import (
    _HOTSPOT_HUGE_METHOD_BYTES,
    _HUGE_METHODS_FLAG,
    _SPARK_HUGE_METHOD_DEFAULT,
    _wants_huge_method_fallback,
    ensure_codegen_confs,
)
from relational_to_doc_oriented_nosql_migrator_spark.operators.common import t

from tests.conftest import SF001

TUNED = f"{_HUGE_METHODS_FLAG} -XX:ReservedCodeCacheSize=512m"


def test_fallback_decision_vanilla_session():
    # No flag anywhere, limit at Spark's default -> lower it.
    assert _wants_huge_method_fallback("", "", _SPARK_HUGE_METHOD_DEFAULT)
    assert _wants_huge_method_fallback(
        "-Xmx1g -XX:+UseG1GC", "", _SPARK_HUGE_METHOD_DEFAULT
    )


def test_fallback_decision_flag_present():
    # The flag in EITHER the live JVM args (local mode truth) or the
    # configured executor opts (cluster executors) means fused methods
    # will JIT — keep the default fused shape.
    assert not _wants_huge_method_fallback(
        TUNED, "", _SPARK_HUGE_METHOD_DEFAULT
    )
    assert not _wants_huge_method_fallback(
        "", TUNED, _SPARK_HUGE_METHOD_DEFAULT
    )


def test_fallback_decision_respects_explicit_user_limit():
    # A user who set hugeMethodLimit themselves wins, whatever the value.
    assert not _wants_huge_method_fallback("", "", "8000")
    assert not _wants_huge_method_fallback("", "", "1048576")


def test_flag_must_be_the_disable_form():
    # "+DontCompileHugeMethods" (explicitly ENABLING the JVM ceiling) must
    # not be mistaken for the disable flag the engine passes.
    assert _wants_huge_method_fallback(
        "-XX:+DontCompileHugeMethods", "", _SPARK_HUGE_METHOD_DEFAULT
    )


def test_tuned_session_is_untouched(spark):
    # The suite session comes from get_spark (flag present): routing an
    # operator through t() must leave the limit at Spark's default so the
    # fused + JIT shape is kept.
    ensure_codegen_confs(spark)
    df = t(spark, SF001, "region")
    assert df.select(F.count("*")).collect()[0][0] > 0
    assert (
        spark.conf.get("spark.sql.codegen.hugeMethodLimit")
        == _SPARK_HUGE_METHOD_DEFAULT
    )


def test_vanilla_session_gets_fallback_end_to_end():
    # The decision tests above pin the logic; this pins the WIRING in
    # the environment that matters — a subprocess SparkSession built
    # WITHOUT the engine factory (no JIT flag), like the external
    # correctness driver and the vanilla scale sweep. One t() call must
    # flip the limit to the HotSpot ceiling.
    import subprocess
    import sys

    code = """
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.ui.enabled", "false").getOrCreate())
from relational_to_doc_oriented_nosql_migrator_spark.operators.common import t
t(spark, "/root/testdata/sf0.001", "region").count()
print("LIMIT=" + spark.conf.get("spark.sql.codegen.hugeMethodLimit"))
spark.stop()
"""
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=180,
        env={"PYTHONPATH": "/root/repo", "PATH": __import__("os").environ["PATH"],
             "JAVA_HOME": __import__("os").environ.get("JAVA_HOME", "")},
    )
    assert f"LIMIT={_HOTSPOT_HUGE_METHOD_BYTES}" in out.stdout, (
        out.stdout + out.stderr[-2000:]
    )


def test_conf_check_memoized_per_application(spark):
    # Second call for the same applicationId is a no-op fast path; a
    # manual mid-session change is NOT clobbered back.
    ensure_codegen_confs(spark)
    spark.conf.set(
        "spark.sql.codegen.hugeMethodLimit", _HOTSPOT_HUGE_METHOD_BYTES
    )
    try:
        ensure_codegen_confs(spark)
        assert (
            spark.conf.get("spark.sql.codegen.hugeMethodLimit")
            == _HOTSPOT_HUGE_METHOD_BYTES
        )
    finally:
        spark.conf.set(
            "spark.sql.codegen.hugeMethodLimit", _SPARK_HUGE_METHOD_DEFAULT
        )
