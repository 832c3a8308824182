"""Extension-filter truth table (FIXTURES.md; filterPaths semantics,
OptimizeRasters.py:4133-4151) — checked against BOTH the pure regex
translation and the Spark rlike column."""

from __future__ import annotations

import re

import pytest

from optimizerasters_spark.operators import filters

# (path, patterns, expected)
TRUTH = [
    ("a/b/x.tif", ["tif"], True),          # bare pattern -> suffix match
    ("x.tiff", ["tif"], False),            # suffix, not substring
    ("x.TIF", ["tif"], False),             # case-sensitive
    ("x.TIF", ["tif", "TIF"], True),       # templates list both cases
    ("x.aux.xml", ["aux.xml"], True),
    ("x.taux.xml", ["aux.xml"], True),     # suffix rule matches this too
    ("x.mrf_cache", ["mrf_cache"], True),
    ("x.tif", ["ovr", "rrd"], False),
    ("anything", ["*"], True),             # leading * taken verbatim
    ("file.x", ["?ile.x"], True),          # leading ? verbatim, matches 'f'
    ("afile.x", ["?ile.x"], False),        # verbatim: no implicit * prefix
    ("file.x", ["*file.x"], True),
    ("x.til", ["til"], True),
]


@pytest.mark.parametrize("path,patterns,want", TRUTH)
def test_truth_table_regex(path, patterns, want):
    rx = filters.patterns_regex(patterns)
    assert bool(re.search(rx, path)) == want, (path, patterns, rx)


def test_truth_table_spark(spark):
    rows = [(i, p) for i, (p, _, _) in enumerate(TRUTH)]
    df = spark.createDataFrame(rows, "id INT, path STRING")
    for i, (path, patterns, want) in enumerate(TRUTH):
        got = df.where(
            (df.id == i) &
            filters.matches_patterns(df.path, patterns)).count() == 1
        assert got == want, (path, patterns)


def test_fnmatch_equivalence():
    """Our translation must agree with Python fnmatchcase on the
    reference's own default lists."""
    import fnmatch
    paths = ["a.tif", "b.mrf", "c.ovr", "d.aux.xml", "e.idx", "f.TIF",
             "g.mrf_cache", "h.til.ovr", "i.tif.cog.pzp", "dir/x.rrd"]
    patterns = ["tif", "mrf", "ovr", "rrd", "aux.xml", "idx", "lrc",
                "mrf_cache", "txt", "TIF"]
    for p in paths:
        for pat in patterns:
            eff = pat if pat[0] in "?*[" else "*" + pat
            want = fnmatch.fnmatchcase(p, eff)
            got = bool(re.search(filters.glob_to_regex(pat), p))
            assert got == want, (p, pat)
