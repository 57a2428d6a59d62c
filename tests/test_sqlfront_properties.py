"""Property-based robustness for the SQL-front rewriter (SURVEY §7
hard part #4: the backtick-path grammar must never corrupt plain SQL).

The reference has no property-based tests (SURVEY §5.5); this is an
extension of its test strategy using hypothesis. No SparkSession needed:
the rewriter only touches Spark when a Drill-ism actually matches.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from hypothesis import given, settings
from hypothesis import strategies as st

from drill_spark.sqlfront import _PATH_TABLE, _parse_tf_options, rewrite


@dataclass
class FakeSession:
    workspaces: dict = field(default_factory=dict)
    spark: object = None


ident = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,10}", fullmatch=True)

plain_sql = st.one_of(
    # realistic SQL shapes without backtick paths
    st.builds(
        "select {} from {} where {} > {}".format,
        ident, ident, ident, st.integers(0, 10_000),
    ),
    st.builds(
        "select {}, count(*) from {} group by {} order by 2 desc limit {}".format,
        ident, ident, ident, st.integers(1, 100),
    ),
    # identifier-quoted (non-path) backticks: single-part names
    st.builds("select `{}` from `{}`".format, ident, ident),
    # arbitrary printable noise (degenerate input must pass through)
    st.text(
        st.characters(codec="ascii", exclude_characters="`"),
        max_size=200,
    ),
)


@given(plain_sql)
@settings(max_examples=300, deadline=None)
def test_rewrite_is_identity_on_plain_sql(q):
    """No workspace, no backticked multi-part path → byte-identical."""
    assert rewrite(FakeSession(), q) == q


@given(ident, st.text(st.characters(codec="ascii", exclude_characters="`"), min_size=1, max_size=50))
@settings(max_examples=200, deadline=None)
def test_unknown_workspace_paths_left_untouched(ws, path):
    """ws.`path` for an unregistered workspace + nonexistent path must
    not be rewritten (Catalyst will raise its own resolution error)."""
    q = f"select * from {ws}.`/nonexistent_root_xyz/{path}`"
    assert rewrite(FakeSession(), q) == q


@given(
    st.lists(
        st.tuples(ident, st.text(st.characters(codec="ascii", exclude_characters="'\"`"), max_size=30)),
        min_size=0,
        max_size=5,
    )
)
@settings(max_examples=200, deadline=None)
def test_table_function_options_roundtrip(pairs):
    """k => 'v' option strings parse back to the same mapping, even with
    commas/parens inside quoted values."""
    raw = ", ".join(f"{k} => '{v}'" for k, v in pairs)
    parsed = _parse_tf_options(raw)
    expect = dict(pairs)
    assert parsed == expect


def test_path_table_regex_shapes():
    """The path-table pattern matches exactly the Drill grammar shapes."""
    assert _PATH_TABLE.search("select * from dfs.`/data/x.json`")
    assert _PATH_TABLE.search("from dfs.tmp.`relative/p.csv`")
    assert not _PATH_TABLE.search("select `col` from t")  # single-part quote
    assert not _PATH_TABLE.search("select 1")
