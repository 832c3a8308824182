"""Property-based tests (hypothesis) for the pure golden math —
the reference-parity kernels must hold over the whole input space, not
just the fixture matrix."""

from __future__ import annotations

import fnmatch
import math
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from optimizerasters_spark import tiling
from optimizerasters_spark.operators import filters


@given(w=st.integers(1, 10**7), h=st.integers(1, 10**7),
       bs=st.sampled_from([256, 512, 1024]))
@settings(max_examples=300, deadline=None)
def test_pyramid_levels_reference_loop_equivalence(w, h, bs):
    """Our function == a direct transcription of the reference's loop
    semantics (value = max/bs float division, int(2**ceil(log2)),
    halving while >= 2, ascending assembly, default '2')."""
    value = max(w, h) / bs
    levels = int(2 ** math.ceil(math.log(value, 2))) if value > 0 else 0
    steps = ""
    while levels >= 2:
        steps = f"{levels} {steps}"
        levels >>= 1
    want = steps.strip() or "2"
    assert tiling.pyramid_levels_str(w, h, bs) == want


@given(w=st.integers(1, 10**7), h=st.integers(1, 10**7))
@settings(max_examples=200, deadline=None)
def test_pyramid_invariants(w, h):
    s = tiling.pyramid_levels_str(w, h)
    factors = [int(x) for x in s.split()]
    # ascending powers of two starting at 2
    assert factors[0] == 2
    for a, b in zip(factors, factors[1:]):
        assert b == 2 * a
    # top factor covers the image: max(w,h) <= top * 512, except the
    # degenerate ratio<=2 default case
    top = factors[-1]
    if max(w, h) > 1024:
        assert max(w, h) <= top * 512
        assert max(w, h) > (top // 2) * 512


@given(px=st.integers(0, 2**40), lv=st.integers(0, 20))
@settings(max_examples=200, deadline=None)
def test_tile_level_composition(px, lv):
    """tile_of then level_up == direct coarse assignment."""
    t0 = tiling.tile_of(px)
    assert tiling.level_up(t0, lv) == px // (512 * (1 << lv))


@given(x=st.integers(0, 2**28), y=st.integers(0, 2**28))
@settings(max_examples=200, deadline=None)
def test_pack_cell_bijective(x, y):
    c = tiling.pack_cell(x, y)
    assert c // tiling.CELL_Y_SPAN == x
    assert c % tiling.CELL_Y_SPAN == y


_PATH_ALPHABET = st.text(
    alphabet="abcXYZ019._-/", min_size=1, max_size=25)
_PATTERN_ALPHABET = st.text(
    alphabet="abcXYZ019._*?", min_size=1, max_size=10)


@given(path=_PATH_ALPHABET, pattern=_PATTERN_ALPHABET)
@settings(max_examples=500, deadline=None)
def test_glob_regex_matches_fnmatchcase(path, pattern):
    """filters.glob_to_regex == fnmatchcase with the reference's
    '*'-prefix rule, for arbitrary paths/patterns."""
    eff = pattern if pattern[0] in "?*[" else "*" + pattern
    want = fnmatch.fnmatchcase(path, eff)
    got = bool(re.search(filters.glob_to_regex(pattern), path))
    assert got == want, (path, pattern)


def test_chunk_documents_coverage_invariants(spark):
    """For every token count 0..40 (window 16, stride 12): chunks never
    exceed the window, the LAST chunk reaches the final token (no tail
    loss), chunk starts advance by exactly the stride, and stitching
    each chunk's first `stride` tokens plus the last chunk reconstructs
    the document verbatim."""
    from pyspark.sql import functions as F
    from optimizerasters_spark.operators import text as T

    # sequence(1, 0) counts DOWN in Spark — guard the n=0 row explicitly
    docs = spark.range(41).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") == 0, F.lit("")).otherwise(
            F.concat_ws(" ", F.transform(
                F.sequence(F.lit(1), F.greatest(F.col("id").cast("int"),
                                                F.lit(1))),
                lambda i: F.concat(F.lit("t"), i.cast("string")))))
        .alias("text"))
    out = T.chunk_documents(docs, window=16, stride=12).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for n in range(41):
        toks = [f"t{i}" for i in range(1, n + 1)]
        # split('', ' ') yields one empty token — mirror that
        base = toks if n > 0 else [""]
        chunks = sorted(by_doc[n], key=lambda r: r["chunk_idx"])
        expect_cnt = 1 if len(base) <= 16 else \
            (len(base) - 16 + 11) // 12 + 1
        assert len(chunks) == expect_cnt, (n, len(chunks))
        assert all(c["n_chunk_tokens"] <= 16 for c in chunks)
        # last chunk covers the final token
        last_start = (len(chunks) - 1) * 12
        assert last_start + chunks[-1]["n_chunk_tokens"] >= len(base)
        # stitch: stride-prefix of each chunk + the whole last chunk
        stitched: list[str] = []
        for c in chunks[:-1]:
            stitched += c["chunk_text"].split(" ")[:12]
        stitched += chunks[-1]["chunk_text"].split(" ")
        assert stitched[:len(base)] == base, (n, stitched, base)
