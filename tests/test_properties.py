"""Property-based and cross-engine-portability tests.

The oracle harness already cross-checks every registry query against
DuckDB; these tests pin the engine-independent building blocks the
oracles rely on (glob translation, portable hash buckets) over much
wider input spaces than the fixtures exercise.
"""

from __future__ import annotations

import fnmatch
import hashlib
import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sparkcollector.filters import _glob_to_regex

# alphabet including glob metacharacters so patterns exercise the
# translator, not just literals
_CHARS = "abcXYZ019 ._-*?"


@given(
    pattern=st.text(alphabet=_CHARS, max_size=12),
    value=st.text(alphabet="abcXYZ019 ._-", max_size=16),
)
@settings(max_examples=300, deadline=None)
def test_glob_to_regex_agrees_with_fnmatch_on_star_question(pattern, value):
    """For the * and ? subset (no [] {} classes), the agent-glob
    translation must agree with fnmatch exactly."""
    compiled = re.compile(_glob_to_regex(pattern))
    assert bool(compiled.fullmatch(value)) == fnmatch.fnmatchcase(value, pattern)


@given(st.text(alphabet=_CHARS + "[]{}!", max_size=12))
@settings(max_examples=200, deadline=None)
def test_glob_to_regex_always_compiles(pattern):
    """No pattern, however malformed (dangling brackets/braces), may
    produce an uncompilable Java-style regex — filters are built from
    user config and must fail soft."""
    re.compile(_glob_to_regex(pattern))


def test_sample_bucket_portable_across_engines(spark):
    """The consistent-hash bucket (first 8 md5 hex chars mod N) must be
    reproducible outside Spark — that's what makes the probabilistic
    sampler's keep/drop decisions portable (and DuckDB-checkable).
    One Spark pass over 500 adversarial-ish strings vs hashlib."""
    from sparkcollector.operators.telemetry import sample_bucket

    vals = [f"trace-{i}-{'x' * (i % 17)}" for i in range(500)] + [
        "", " ", "ünïcodé", "a|b|c", '"quoted"', "\\backslash",
    ]
    df = spark.createDataFrame([(v,) for v in vals], ["k"])
    got = {
        r["k"]: r["b"]
        for r in df.select("k", sample_bucket(F.col("k")).alias("b")).collect()
    }
    for v in vals:
        expect = int(hashlib.md5(v.encode()).hexdigest()[:8], 16) % 100
        assert got[v] == expect, v


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.text(alphabet="ab ", max_size=8)),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=30, deadline=None)
def test_severity_map_total(severities_ignored):
    """SEVERITY_MAP maps every alias to a canonical band; lookups of
    unknown tokens yield None rather than raising (stanza parsers pass
    records through on no-match)."""
    from sparkcollector.parse import SEVERITY_MAP

    for raw, _ in severities_ignored:
        token = ["TRACE", "WARNING", "EMERG", "nonsense"][raw]
        out = SEVERITY_MAP.get(token)
        if token == "nonsense":
            assert out is None
        else:
            assert out in {"trace", "debug", "info", "warn", "error",
                           "error2", "error3", "fatal"}


def test_zorder_matches_python_morton_property(spark):
    """zorder_key equals the reference Python Morton interleave for
    arbitrary 16-bit inputs (hypothesis-driven batch)."""
    from hypothesis import given, settings, strategies as st
    from pyspark.sql import functions as F

    from sparkcollector.skew import zorder_key

    def morton(x, y, bits=16):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    collected = []

    @settings(max_examples=30, deadline=None)
    @given(st.integers(0, 65535), st.integers(0, 65535))
    def gen(x, y):
        collected.append((x, y))

    gen()
    df = spark.createDataFrame(collected, "x int, y int")
    got = [
        (r["x"], r["y"], r["z"])
        for r in df.select(
            "x", "y", zorder_key(F.col("x"), F.col("y"), bits=16).alias("z")
        ).collect()
    ]
    for x, y, z in got:
        assert z == morton(x, y), (x, y, z)


def test_transform_attrs_matches_python_model_property(spark):
    """OTTL map-function chain equals a direct Python model on random
    attribute maps (keep -> replace -> truncate -> limit order)."""
    import re

    from hypothesis import given, settings, strategies as st
    from pyspark.sql import functions as F

    from sparkcollector.operators.telemetry import transform_attrs

    keys = ["alpha", "beta", "gamma", "delta"]
    cases = []

    @settings(max_examples=25, deadline=None)
    @given(
        st.dictionaries(
            st.sampled_from(keys),
            st.text(
                alphabet=st.characters(whitelist_categories=("Ll", "Nd")),
                max_size=12,
            ),
            max_size=4,
        )
    )
    def gen(m):
        cases.append(dict(m))

    gen()

    def model(m):
        kept = {k: v for k, v in m.items() if k in ("alpha", "beta", "gamma")}
        rep = {k: re.sub(r"[0-9]+", "N", v) for k, v in kept.items()}
        tru = {k: v[:5] for k, v in rep.items()}
        return dict(sorted(tru.items())[:2])

    rows = [(i, c) for i, c in enumerate(cases)]
    df = spark.createDataFrame(rows, "id int, m map<string,string>")
    out = {
        r["id"]: r["t"]
        for r in df.select(
            "id",
            transform_attrs(
                F.col("m"),
                keep_keys=["alpha", "beta", "gamma"],
                replace_pattern=(r"[0-9]+", "N"),
                truncate_to=5,
                limit_to=2,
            ).alias("t"),
        ).collect()
    }
    for i, c in enumerate(cases):
        assert out[i] == model(c), (c, out[i])
