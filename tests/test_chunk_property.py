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


# ---------------------------------------------------------------------------
# content-defined chunking (cdc_chunk_documents)
# ---------------------------------------------------------------------------


def _cdc(spark, texts, **kw):
    from tfx_addons_feast_examplegen_spark.operators.text import (
        cdc_chunk_documents,
    )

    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    return cdc_chunk_documents(df, **kw)


def test_cdc_reassembly_is_lossless(spark):
    # chunk boundaries partition the token stream: concatenating
    # chunk_texts in chunk_idx order reconstructs lower(text) exactly
    # (single-space split is lossless by construction)
    texts = [
        " ".join(f"tok{(i * 7) % 101}" for i in range(120)),
        "short doc",
        "",
    ]
    rows = _cdc(spark, texts).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_text))
    for i, t in enumerate(texts):
        got = " ".join(txt for _, txt in sorted(by_doc[i]))
        assert got == t.lower()
    # chunk_idx is dense from 0 per doc
    for i in by_doc:
        idxs = sorted(ci for ci, _ in by_doc[i])
        assert idxs == list(range(len(idxs)))


def test_cdc_edit_locality_beats_fixed_stride(spark):
    # THE content-defined property: a one-token edit changes only the
    # chunk it lands in (± the w-1 hash windows it touches); every
    # other chunk hash is bit-identical. Fixed-stride chunking shifts
    # every window after an INSERTION instead.
    toks = [f"tok{i}" for i in range(400)]  # unique -> unique chunk hashes
    base = " ".join(toks)
    edited = " ".join(toks[:200] + ["EDITED"] + toks[200:])  # insertion
    rows = _cdc(spark, [base, edited]).collect()
    h = {0: set(), 1: set()}
    n = {0: 0, 1: 0}
    for r in rows:
        h[r.doc_id].add(r.chunk_hash)
        n[r.doc_id] += 1
    assert len(h[0]) == n[0] and len(h[1]) == n[1]
    shared = h[0] & h[1]
    # boundaries re-synchronize at the first boundary past the edit:
    # every chunk except the edited one (and the <= w-1 windows it
    # touches, which can merge/split its neighbors) survives unchanged
    assert len(shared) >= n[0] - 4
    assert len(h[0] ^ h[1]) <= 8

    from tfx_addons_feast_examplegen_spark.operators.text import (
        chunk_documents,
    )

    df = spark.createDataFrame(
        [Row(doc_id=0, text=base), Row(doc_id=1, text=edited)],
        "doc_id long, text string",
    )
    fixed = chunk_documents(df, "doc_id", "text", chunk_tokens=8, stride=8)
    fh = {0: set(), 1: set()}
    from pyspark.sql import functions as F

    for r in fixed.withColumn("ch", F.md5("chunk_text")).collect():
        fh[r["doc_id"]].add(r["ch"])
    # the same insertion shifts (almost) every fixed-stride chunk after
    # position 200 — CDC must strictly beat it on survival
    assert len(fh[0] & fh[1]) < len(shared)


def test_cdc_expected_chunk_len_and_validation(spark):
    import pytest as _pytest

    from tfx_addons_feast_examplegen_spark.operators.text import (
        cdc_chunk_documents,
    )

    rows = _cdc(
        spark,
        [" ".join(f"tok{(i * 31) % 997}" for i in range(2000))],
        w=4,
        divisor=8,
    ).collect()
    mean_len = sum(r.n_tokens for r in rows) / len(rows)
    assert 4 <= mean_len <= 16  # ~divisor tokens per chunk

    df = _cdc(spark, ["a b c"]).sparkSession.createDataFrame(
        [Row(doc_id=0, text="a b c")], "doc_id long, text string"
    )
    with _pytest.raises(ValueError, match="w must"):
        cdc_chunk_documents(df, w=0)
    with _pytest.raises(ValueError, match="divisor"):
        cdc_chunk_documents(df, divisor=0)
