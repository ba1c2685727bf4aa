"""Property-based check: chunk_documents invariants vs a Python model
over randomized token streams (coverage, ordering, window shape)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from tfx_addons_feast_examplegen_spark.operators.text import chunk_documents

_doc = st.lists(
    st.integers(min_value=0, max_value=50).map(lambda i: f"w{i}"),
    min_size=0,
    max_size=40,
)
_params = st.tuples(
    st.integers(min_value=1, max_value=8),   # chunk_tokens
    st.integers(min_value=1, max_value=8),   # stride
)


def _model(tokens, chunk_tokens, stride):
    out = []
    if not tokens:
        return out
    for idx, s in enumerate(range(0, len(tokens), stride)):
        # r6 containment rule: a window whose predecessor already
        # reached the doc end adds zero coverage and is not emitted
        if s > 0 and s - stride + chunk_tokens >= len(tokens):
            break
        w = tokens[s : s + chunk_tokens]
        if w:
            out.append((idx, " ".join(w), len(w)))
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(_doc, min_size=1, max_size=4), params=_params)
def test_chunks_match_python_model(spark, docs, params):
    chunk_tokens, stride = params
    df = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.chunk_idx, r.chunk_text, r.n_tokens)
        for r in chunk_documents(
            df, chunk_tokens=chunk_tokens, stride=stride
        ).collect()
    }
    want = {
        (i, idx, text, n)
        for i, toks in enumerate(docs)
        for idx, text, n in _model(toks, chunk_tokens, stride)
    }
    assert got == want
