"""Property-based check: editdist_pairs vs quadratic Levenshtein over
hypothesis-generated corpora (tiny alphabet maximizes accidental
near-matches, short-pool boundary straddled by construction)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.test_editdist import _lev
from tfx_addons_feast_examplegen_spark.operators.editdist import editdist_pairs

_corpus = st.lists(
    st.text(alphabet="ab", min_size=0, max_size=9),
    min_size=2,
    max_size=14,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(strs=_corpus, k=st.integers(min_value=0, max_value=4))
def test_pairs_match_bruteforce(spark_prop, strs, k):
    rows = list(enumerate(strs))
    df = spark_prop.createDataFrame(rows, "id: long, t: string")
    got = {
        (r["doc_a"], r["doc_b"], r["ed"])
        for r in editdist_pairs(df, "id", "t", k=k).collect()
    }
    exp = {
        (i, j, _lev(a, b))
        for i, a in rows
        for j, b in rows
        if i < j and _lev(a, b) <= k
    }
    assert got == exp
