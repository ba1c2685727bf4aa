"""Adversarial hardening of the contract oracles (VERDICT r5 item 5).

The simhash / ANN-LSH / ANN-IVF correctness entries are CONTRACTS: the
driver's DuckDB oracle asserts semantic guarantees (completeness,
per-query hits, recall floors) rather than hash-comparing unportable
bit votes. A contract that can only ever be observed green proves
nothing — each test here breaks the production pipeline the way a real
regression would (a wrong fold, a skipped probe) and asserts the
contract row actually turns red.

Mutations are applied by monkeypatching the operator seam the contract
entry calls (``queries.py`` resolves ``dd.simhash`` /
``sim.lsh_topk`` / ``sim.ivf_topk`` at call time), so the contract
logic itself runs unmodified — exactly what the driver would execute.
All three mutations verified deterministic at sf0.001 (fixed fixture
data, seeded hashes/planes/k-means).
"""

import pyspark.sql.functions as F

from tfx_addons_feast_examplegen_spark import queries as qmod
from tfx_addons_feast_examplegen_spark.operators import dedup as dd
from tfx_addons_feast_examplegen_spark.operators import similarity as sim


def test_simhash_contract_catches_broken_fold(spark, sf_dir, monkeypatch):
    # Corrupt the vote fold for every odd doc id (XOR the low 16-bit
    # chunk — the kind of wrong-shift/wrong-mask bug band arithmetic
    # invites). Exact-dup pairs with one odd member now differ by up to
    # 16 bits, so the hamming<=3 filter drops them and the completeness
    # check (exact_dup_pairs_missed_by_prod == 0) must go red.
    real = dd.simhash

    def broken(df, id_col, text_col, **kw):
        out = real(df, id_col, text_col, **kw)
        return out.withColumn(
            "simhash",
            F.when(
                F.col(id_col) % 2 == 1,
                F.col("simhash").bitwiseXOR(F.lit(0xFFFF)),
            ).otherwise(F.col("simhash")),
        )

    monkeypatch.setattr(dd, "simhash", broken)
    rows = {
        r["check"]: (r["value"], r["ok"])
        for r in qmod._q_simhash(spark, sf_dir).collect()
    }
    missed, ok = rows["exact_dup_pairs_missed_by_prod"]
    assert missed > 0 and ok is False, rows
    # the well-formedness check is independent of the fold and stays green
    assert rows["prod_pairs_wellformed"][1] is True, rows


def test_ann_lsh_contract_catches_skipped_probes(
    spark, sf_dir, monkeypatch
):
    # Disable multi-probe AND collapse banding to one full-signature
    # band: true neighbors no longer meet in any bucket, so the
    # per-query >=1-hit contract must produce red rows.
    real = sim.lsh_topk

    def broken(emb, **kw):
        kw["n_probe_bits"] = 0
        kw["bands"] = 1
        return real(emb, **kw)

    monkeypatch.setattr(sim, "lsh_topk", broken)
    rows = qmod._q_ann_lsh(spark, sf_dir).collect()
    assert len(rows) == 20  # every query still gets its verdict row
    assert any(not r["hit_ok"] for r in rows), rows


def test_ann_ivf_contract_catches_skipped_probes(
    spark, sf_dir, monkeypatch
):
    # Probe 1 of 16 cells instead of the contracted 4: measured recall
    # falls below the 0.3 floor and the aggregate contract goes red.
    real = sim.ivf_topk

    def broken(emb, **kw):
        kw["n_probe"] = 1
        return real(emb, **kw)

    monkeypatch.setattr(sim, "ivf_topk", broken)
    row = qmod._q_ann_ivf(spark, sf_dir).collect()[0]
    assert row["n_queries"] == 20
    assert row["recall_ok"] is False, row


def test_stream_recovery_oracle_catches_dropped_timeout_emission(
    spark, sf_dir, monkeypatch
):
    # The sentinel-watermark replay technique (VERDICT r7 item 7): the
    # far-future sentinel advances the watermark past every deadline so
    # the stream must emit BOTH matched errors and recovered=false
    # timeouts. The classic regression is dropping the timeout-emission
    # branch (emit only matches). Applied at the operator seam the
    # entry resolves at call time; the entry's own sentinel/replay
    # plumbing runs unmodified. The driver's oracle (batch per-error
    # min-purchase LEFT lookup) has one row per ERROR, so the mutation
    # must shrink the row count -> rows_match red.
    from tfx_addons_feast_examplegen_spark.queries.streaming import (
        _q_stream_error_recovery,
    )
    from tfx_addons_feast_examplegen_spark.streaming import patterns as pat

    baseline = _q_stream_error_recovery(spark, sf_dir).collect()
    n_base = len(baseline)
    n_timeouts = sum(1 for r in baseline if not r.recovered)
    assert n_timeouts > 0, "fixture must exercise the timeout branch"

    real = pat.match_recovery_stream

    def drops_timeouts(events, **kw):
        return real(events, **kw).filter("recovered")

    monkeypatch.setattr(pat, "match_recovery_stream", drops_timeouts)
    mutated = _q_stream_error_recovery(spark, sf_dir).collect()
    assert len(mutated) == n_base - n_timeouts
    assert len(mutated) < n_base  # oracle rows_match would go red
    assert all(r.recovered for r in mutated)


def test_sketch_bound_contract_catches_drifted_estimate(
    spark, sf_dir, monkeypatch
):
    # The error-bound technique (SURVEY 5.2): sketch estimates aren't
    # bit-portable, so the oracle checks a boolean asserting the
    # estimate sits within 3x rsd of the exact count (oracle emits
    # literal TRUE). A sketch whose bias correction broke — here a 2x
    # drift injected at the F.approx_count_distinct seam the entry
    # resolves at call time — must flip the boolean and redden the
    # hash. The exact counts (the portable columns) stay green, proving
    # the mutation is caught by the bound, not by collateral damage.
    from tfx_addons_feast_examplegen_spark.queries import skew as qskew

    real = F.approx_count_distinct

    def drifted(col, rsd=None):
        base = real(col, rsd) if rsd is not None else real(col)
        return (base * 2).cast("long")

    baseline = {
        r["l_returnflag"]: r for r in qskew._q_sketch_distinct(spark, sf_dir).collect()
    }
    assert all(
        r.orders_in_bound and r.parts_in_bound for r in baseline.values()
    ), baseline

    monkeypatch.setattr(qskew.F, "approx_count_distinct", drifted)
    mutated = qskew._q_sketch_distinct(spark, sf_dir).collect()
    assert all(
        not (r.orders_in_bound or r.parts_in_bound) for r in mutated
    ), mutated  # oracle's literal TRUE -> hash red
    for r in mutated:
        b = baseline[r.l_returnflag]
        assert (r.exact_orders, r.exact_parts) == (
            b.exact_orders,
            b.exact_parts,
        )


def test_codec_oracle_catches_idct_rounding_mutation(monkeypatch):
    # VERDICT r8 item 4: the meet-in-the-middle codec oracle (decode a
    # self-encoded container, compare channel stats against the
    # closed-form pixel formula) is the last oracle technique without a
    # can-this-fail proof. Perturb the IDCT rounding by one ulp — the
    # exact class of bug a DCT rewrite invites — and assert the decoded
    # pixels diverge from the formula, i.e. the driver's value-hash
    # comparison for multimodal_image_jpeg(_progressive) would go red.
    from tfx_addons_feast_examplegen_spark.operators import multimodal as mm

    did = 5
    w, h = (did % 3 + 1) * 8, (did % 2 + 1) * 8
    px = [
        (did * 7 + (y // 8) * 31 + (x // 8) * 3) % 256
        for y in range(h)
        for x in range(w)
    ]
    base_pay = mm.encode_jpeg_gray(w, h, px)
    prog_pay = mm.encode_jpeg_gray_progressive(w, h, px)
    # sanity: un-mutated, the oracle property holds bit-exactly
    assert mm.decode_jpeg_gray_pixels(base_pay)[2] == px
    assert mm.decode_jpeg_gray_pixels(prog_pay)[2] == px

    real = mm._idct8x8

    def drifted(coef):
        return [min(255, v + 1) for v in real(coef)]  # one-ulp drift

    monkeypatch.setattr(mm, "_idct8x8", drifted)
    for pay in (base_pay, prog_pay):
        got = mm.decode_jpeg_gray_pixels(pay)[2]
        assert got != px
        assert sum(got) != sum(px)  # r_sum column differs -> red hash


def test_codec_oracle_catches_png_unfilter_mutation(monkeypatch):
    # Same proof for the PNG path: break the Paeth predictor's b-vs-c
    # tie-break (prefer c on pb == pc — the classic transcription slip
    # in the three-way comparison; the a-vs-b tie provably cannot
    # diverge since pa == pb with a != b forces pc == 0). Zlib CRCs
    # cover the COMPRESSED bytes, so the corrupt unfilter decodes
    # without error and only the oracle's formula comparison catches
    # it. Seed 13 is a verified content where the tie fires on a
    # Paeth-filtered row (the encoder cycles filter types per row).
    import random

    from tfx_addons_feast_examplegen_spark.operators import multimodal as mm

    rng = random.Random(13)
    w, h = 16, 10
    pixels = [
        (rng.randrange(256), rng.randrange(256), rng.randrange(256))
        for _ in range(w * h)
    ]
    pay = mm.encode_png_rgb8(w, h, pixels)
    assert mm.decode_png_rgb8_pixels(pay)[2] == pixels  # sanity

    def broken(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb < pc else c  # was <=: pb == pc now picks c

    monkeypatch.setattr(mm, "_paeth", broken)
    got = mm.decode_png_rgb8_pixels(pay)[2]
    assert got != pixels  # decodes cleanly but the oracle hash reds


def test_codec_oracle_catches_gif_lzw_mutations(monkeypatch):
    # VERDICT r9 item 6: complete the can-this-fail proof for all four
    # image codecs. GIF has no CRC anywhere, so NOTHING but the oracle's
    # formula comparison guards the LZW decode. Break it two classic
    # ways — (a) the KwKwK first-use expansion appends the LAST symbol
    # of the previous entry instead of the first, (b) the code-width
    # growth fires one table entry LATE — and assert each decodes the
    # fixture without raising (or fails loud) while the channel sums the
    # driver hashes diverge from the true pixels.
    import struct as _s

    from tfx_addons_feast_examplegen_spark.operators import multimodal as mm

    def make_broken(kwkwk_last: bool, late_widen: bool):
        def broken(data, min_code_size, n_pixels):
            clear = 1 << min_code_size
            eoi = clear + 1
            table = [(-1, i) for i in range(clear)] + [(-1, 0)] * 2
            width = min_code_size + 1
            out, acc, n, pos, prev = [], 0, 0, 0, -1

            def expand(code):
                chain = []
                while code >= 0:
                    p, sym = table[code]
                    chain.append(sym)
                    code = p
                chain.reverse()
                return chain

            while len(out) < n_pixels:
                while n < width:
                    if pos >= len(data):
                        raise ValueError("truncated GIF LZW stream")
                    acc |= data[pos] << n
                    pos += 1
                    n += 8
                code = acc & ((1 << width) - 1)
                acc >>= width
                n -= width
                if code == eoi:
                    break
                if code == clear:
                    table = table[: clear + 2]
                    width = min_code_size + 1
                    prev = -1
                    continue
                if prev < 0:
                    out.extend(expand(code))
                else:
                    if code < len(table):
                        entry = expand(code)
                    elif code == len(table):
                        entry = expand(prev)
                        # MUTATION (a): cScSc becomes cS..S-last
                        entry.append(entry[-1] if kwkwk_last else entry[0])
                    else:
                        raise ValueError("GIF LZW code beyond table")
                    if len(table) < 4096:
                        table.append((prev, entry[0]))
                        # MUTATION (b): >= becomes > (widen one late)
                        grown = (
                            len(table) > (1 << width)
                            if late_widen
                            else len(table) >= (1 << width)
                        )
                        if grown and width < 12:
                            width += 1
                    out.extend(entry)
                prev = code
            if len(out) < n_pixels:
                raise ValueError("GIF LZW stream ended early")
            del out[n_pixels:]
            return out

        return broken

    # Fixture 1 exercises KwKwK with a multi-symbol previous entry whose
    # first and last symbols differ; the period-3 "aab" pattern is used
    # (verified) because symmetric alternations like "abab"/"aabb"
    # decode to a PERMUTATION of the true pixels under mutation (a) —
    # position-only divergence that sum-statistics provably cannot see.
    # Fixture 2's 4-color pseudo-random content grows the table through
    # several width boundaries, where mutation (b) desynchronizes the
    # code stream and fails loud ("beyond table" — also a red row).
    run = ([(9, 9, 9), (9, 9, 9), (0, 200, 0)] * 22)[:64]
    pal = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    rnd = [pal[(i * i * 7 + i * 3) % 4] for i in range(16 * 16)]
    run_pay = mm.encode_gif_rgb8(8, 8, run)
    rnd_pay = mm.encode_gif_rgb8(16, 16, rnd)
    assert mm.decode_gif_rgb8_pixels(run_pay) == (8, 8, run)  # sanity
    assert mm.decode_gif_rgb8_pixels(rnd_pay) == (16, 16, rnd)

    real = mm._gif_lzw_decode
    for kw, late, pay, truth in (
        (True, False, run_pay, run),
        (False, True, rnd_pay, rnd),
    ):
        monkeypatch.setattr(mm, "_gif_lzw_decode", make_broken(kw, late))
        try:
            got = mm.decode_gif_rgb8_pixels(pay)[2]
        except (ValueError, _s.error):
            got = None  # loud failure also reds the driver row
        assert got != truth
        if got is not None:
            # the stats the driver hashes (channel sums) diverge
            assert sum(r for r, _, _ in got) != sum(r for r, _, _ in truth)
        monkeypatch.setattr(mm, "_gif_lzw_decode", real)


def test_codec_oracle_catches_tiff_lzw_early_change_mutation(monkeypatch):
    # Fifth codec, same proof: TIFF LZW's "early change" rule (width
    # grows at table sizes 510/1022/2046, one entry before the power
    # boundary) is the single most-transcribed-wrong detail of the
    # format. Shift the decoder's boundaries one entry late (the
    # standard-LZW reading of the spec) and assert a boundary-crossing
    # strip fails to decode or decodes divergent — either way the
    # driver row for a TIFF payload goes red. TIFF has no CRC; nothing
    # but this catches it.
    from tfx_addons_feast_examplegen_spark.operators import multimodal as mm

    real = mm._tiff_lzw_decode

    def late(data, expected):
        CLEAR, EOI = 256, 257
        roots = [bytes([i]) for i in range(256)] + [b"", b""]
        table = list(roots)
        width = 9
        out = bytearray()
        acc = nbits = pos = 0
        prev = None
        while len(out) < expected:
            while nbits < width:
                if pos >= len(data):
                    raise ValueError("truncated TIFF LZW stream")
                acc = (acc << 8) | data[pos]
                pos += 1
                nbits += 8
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == EOI:
                break
            if code == CLEAR:
                table = list(roots)
                width = 9
                prev = None
                continue
            if prev is None:
                if code >= 256:
                    raise ValueError("first code not a root")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]
            else:
                raise ValueError("code beyond table")
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
                # MUTATION: standard-LZW boundaries, one entry late
                if len(table) in (511, 1023, 2047):
                    width += 1
            out += entry
            prev = entry
        if len(out) < expected:
            raise ValueError("ended early")
        return bytes(out[:expected])

    import random

    rng = random.Random(7)
    w, h = 32, 32  # 3072 bytes incompressible: crosses 510 and 1022
    px = [tuple(rng.randrange(256) for _ in range(3)) for _ in range(w * h)]
    pay = mm.encode_tiff_rgb8(w, h, px, compression=5)
    assert mm.decode_tiff_rgb8_pixels(pay) == (w, h, px)  # sanity

    monkeypatch.setattr(mm, "_tiff_lzw_decode", late)
    try:
        got = mm.decode_tiff_rgb8_pixels(pay)[2]
    except ValueError:
        got = None  # loud desync also reds the row
    assert got != px
    monkeypatch.setattr(mm, "_tiff_lzw_decode", real)


def test_editdist_bruteforce_check_catches_narrowed_window(spark, monkeypatch):
    # Shrink the pigeonhole shift window from +-k to +-0: a pair whose
    # surviving segment shifted position (one deletion before it) now
    # never meets its probe substring, so the candidate generator
    # silently loses the pair — exactly the bug class the brute-force
    # equivalence tests exist to redden.
    import tfx_addons_feast_examplegen_spark.operators.editdist as ed

    real = ed._probe_windows

    def narrowed(df, id_col, text_col, k):
        return real(df, id_col, text_col, 0) if k > 0 else real(
            df, id_col, text_col, k
        )

    # 'xabcdefgh' vs 'abcdefgh': one deletion at the front shifts every
    # segment of the shorter string by one inside the longer.
    df = spark.createDataFrame(
        [(1, "xabcdefgh"), (2, "abcdefgh")], ["id", "t"]
    )
    baseline = ed.editdist_pairs(df, "id", "t", k=2).count()
    assert baseline == 1
    monkeypatch.setattr(ed, "_probe_windows", narrowed)
    assert ed.editdist_pairs(df, "id", "t", k=2).count() == 0


def test_segdedup_oracle_catches_lastwins_mutation(spark, monkeypatch):
    # Flip first-wins to last-wins (max instead of min): the keeper
    # moves to the highest (doc_id, seg_idx), so the rewritten corpus
    # differs on any cross-doc duplicate — the driver oracle's
    # ROW_NUMBER ... ORDER BY doc_id, seg_idx comparison must go red.
    import tfx_addons_feast_examplegen_spark.operators.segdedup as sd

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b x y")], ["doc_id", "text"]
    )
    expected = {
        r["doc_id"]: r["text"]
        for r in sd.segment_dedup(df, "doc_id", "text", width=2).collect()
    }
    assert expected == {1: "a b c d", 2: "x y"}
    monkeypatch.setattr(sd.F, "min", F.max)
    mutated = {
        r["doc_id"]: r["text"]
        for r in sd.segment_dedup(df, "doc_id", "text", width=2).collect()
    }
    assert mutated != expected
    assert mutated[1] == "c d" and mutated[2] == "a b x y"


def test_token_budget_check_catches_offset_drop(spark, monkeypatch):
    # Zero out the cross-bucket offset in the boundary-bucket filter
    # (forgetting acc is THE off-by-one this decomposition invites):
    # the boundary bucket then admits rows past the budget, diverging
    # from the SUM-OVER oracle.
    from tfx_addons_feast_examplegen_spark.operators import curation as cu

    rows = [(i, float(i), 1) for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "score", "toks"])
    budget = 60
    ok = cu.token_budget_select(
        df, "score", "toks", budget, id_col="doc_id",
        num_buckets=4, sample_fraction=1.0,
    ).count()
    assert ok == budget
    # accumulation is integer-unit (round 12): acc reaches the boundary
    # bucket as the INT literal 50 (two full 25-row buckets; quantile
    # bounds over scores 0..99 land at 24/49/74) while the budget
    # literal is 60 — so exactly-50 pins the offset alone.
    real_lit = cu.F.lit

    def zero_acc(v):
        if type(v) is int and v == 50:
            return real_lit(0)
        return real_lit(v)

    monkeypatch.setattr(cu.F, "lit", zero_acc)
    mutated = cu.token_budget_select(
        df, "score", "toks", budget, id_col="doc_id",
        num_buckets=4, sample_fraction=1.0,
    ).count()
    assert mutated > ok


def test_dhash_oracle_catches_gray_rounding_mutation(spark, monkeypatch):
    # Drift the grayscale mean by one ulp ((r+g+b+1)//3 instead of
    # (r+g+b)//3 — the classic rounding-mode bug): decoded gray no
    # longer equals the md5 closed form the driver oracle replays, so
    # band values shift and the hash compare must go red. Verified by
    # re-deriving the closed form here, exactly as the oracle does.
    import hashlib as _hl

    from tfx_addons_feast_examplegen_spark.operators import multimodal as mm

    docs = spark.range(0, 12).select(F.col("id").alias("doc_id"))
    media = mm.attach_bmp_neardup_payloads(docs)

    real = mm.decode_bmp_24_pixels

    def drifted(payload):
        w, h, px = real(payload)
        # +1 on every channel of pixel 0: integer-mean gray of pixel 0
        # moves by exactly 1 — the smallest decode drift possible
        r, g, b = px[0]
        px = [((r + 1) % 256, (g + 1) % 256, (b + 1) % 256)] + px[1:]
        return w, h, px

    monkeypatch.setattr(mm, "decode_bmp_24_pixels", drifted)
    rows = mm.extract_image_gray(media).collect()

    def closed_form(did):
        dup = did % 10 == 1
        base = did - 1 if dup else did
        v = [
            int(_hl.md5(f"{base}-{p}".encode()).hexdigest()[:2], 16)
            for p in range(72)
        ]
        if dup:
            v[0] = (v[0] + 96) % 256
            v[31] = (v[31] + 96) % 256
        return v

    diverged = [
        r["doc_id"]
        for r in rows
        if list(r["gray"]) != closed_form(r["doc_id"])
    ]
    assert len(diverged) == 12, diverged  # every image drifts -> red


def test_audio_fp_oracle_catches_frame_offset_mutation(spark, monkeypatch):
    # Start framing one sample late (the off-by-one a header walk
    # invites): every frame energy changes, the fingerprint diverges
    # from the closed form, and planted pairs are no longer guaranteed
    # within Hamming 2 — the pair-set/hash compare goes red.
    from tfx_addons_feast_examplegen_spark.operators import multimodal as mm

    docs = spark.range(0, 40).select(F.col("id").alias("doc_id"))
    media = mm.attach_wav_neardup_payloads(docs)
    baseline = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in mm.audio_fingerprint_neardups(
            mm.extract_audio_frame_energies(media)
        ).collect()
    }
    assert {(a, b) for a, b, _ in baseline} == {
        (i - 1, i) for i in range(1, 40) if i % 10 == 1
    }

    real = mm.decode_wav_pcm16_samples

    def offset(payload):
        rate, samples = real(payload)
        return rate, samples[1:] + [0]

    monkeypatch.setattr(mm, "decode_wav_pcm16_samples", offset)
    mutated = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in mm.audio_fingerprint_neardups(
            mm.extract_audio_frame_energies(mm.attach_wav_neardup_payloads(docs))
        ).collect()
    }
    # the perturbed sample now straddles different frames; hamming
    # values (and with them the driver's value hash) change
    assert mutated != baseline, mutated


def test_corpus_sketch_oracle_catches_wrong_winner_mutation(spark, monkeypatch):
    # Keep the MAX hash per bucket instead of the MIN (the wrong-winner
    # bug an agg refactor invites). NB a bucket-relabel drift ((h+1)%k)
    # would NOT redden this entry — matched counts are invariant under
    # a consistent relabel — so the mutation must change WHICH element
    # each bucket samples: max-wise sampling picks different shared/
    # unshared winners, matched shifts, and the driver oracle (which
    # replays min exactly) goes value-hash red. Proven by the output
    # differing from the unmutated run on the same corpora.
    from tfx_addons_feast_examplegen_spark.operators import sketches as sk

    rows = [("A", f"x{i} y{i} z{i} w{i}") for i in range(200)] + [
        ("B", f"x{i} y{i} z{i} w{i}") for i in range(100, 300)
    ]
    df = spark.createDataFrame(rows, "corpus: string, text: string")
    base = sk.minhash_corpus_overlap(
        sk.minhash_corpus_sketch(df, "corpus", "text", k=64), "corpus"
    ).collect()[0]

    monkeypatch.setattr(sk.F, "min", sk.F.max)
    mut = sk.minhash_corpus_overlap(
        sk.minhash_corpus_sketch(df, "corpus", "text", k=64), "corpus"
    ).collect()[0]
    assert (base["matched"], base["jaccard_e4"]) != (
        mut["matched"],
        mut["jaccard_e4"],
    ), (base, mut)


def test_stream_gate_oracle_catches_broken_rowwise_fold(
    spark, monkeypatch, tmp_path
):
    # XOR the low band of the row-wise stream-side hash (the wrong-
    # shift/mask bug band arithmetic invites): planted exact copies no
    # longer meet the corpus at Hamming<=3 through EVERY band — pairs
    # drop or change hamming, so the driver's value hash (and the
    # from-scratch oracle) goes red. Mutation applied at the operator
    # seam the entry calls; the banded join machinery runs unmodified.
    from tfx_addons_feast_examplegen_spark.operators import dedup as dd
    from tfx_addons_feast_examplegen_spark.streaming.events import (
        run_to_completion,
    )

    rows = [(i, f"tok{i % 12} alpha beta gamma delta") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    corpus, new = docs.where("doc_id < 15"), docs.where("doc_id >= 15")
    idx = dd.simhash_band_index(corpus, "doc_id", "text")

    runs = [0]

    def run():
        runs[0] += 1
        src = str(tmp_path / f"gate_mut_{runs[0]}")
        new.repartition(2).write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(new.schema).parquet(src)
        out = run_to_completion(
            dd.neardup_gate_stream(
                stream, idx, id_col="doc_id", text_col="text"
            ),
            query_name="gate_mut",
        )
        return {
            (r["doc_id"], r["corpus_id"], r["hamming"])
            for r in out.collect()
        }

    baseline = run()
    assert baseline, "fixture must produce matches (doc i vs i-15 twins)"

    real = dd.simhash_rowwise_expr

    def broken(text_col):
        return real(text_col).bitwiseXOR(F.lit(0x7FFF))

    monkeypatch.setattr(dd, "simhash_rowwise_expr", broken)
    mutated = run()
    assert mutated != baseline, mutated


def test_robots_oracle_catches_broken_longest_match_tiebreak(
    spark, monkeypatch
):
    # Flip the winner aggregate (max -> min over struct(len, allow)):
    # the verdict becomes SHORTEST-match with deny-on-tie — both RFC
    # 9309 §2.2.2 properties broken at once. On the registry fixture's
    # rule shapes (longer allow overriding a disallow; an equal-length
    # allow/deny tie) the flipped verdicts diverge from the driver
    # oracle's ROW_NUMBER ... ORDER BY length DESC, allow DESC spelling,
    # so the url_robots_filter contract row must go red.
    from tfx_addons_feast_examplegen_spark.operators import crawl as cr

    urls = spark.createDataFrame(
        [
            (1, "h0", "/src1/en/p1"),   # /src1 deny(5) vs /src1/en allow(8)
            (2, "h0", "/src2/x"),       # /src2 deny vs /src2 allow — tie
            (3, "h0", "/other/p3"),     # no rule matches — default allow
        ],
        ["url_id", "host", "path"],
    )
    rules = spark.createDataFrame(
        [
            ("h0", "/src1", False),
            ("h0", "/src1/en", True),
            ("h0", "/src2", False),
            ("h0", "/src2", True),
        ],
        ["host", "prefix", "allow"],
    )

    def run():
        return {
            r["url_id"]: (r["allowed"], r["rule_len"])
            for r in cr.robots_filter(urls, rules).collect()
        }

    baseline = run()
    assert baseline == {1: (True, 8), 2: (True, 5), 3: (True, None)}

    monkeypatch.setattr(cr.F, "max", F.min)
    mutated = run()
    # longest-match broken: url 1 now sees the /src1 disallow win
    assert mutated[1] == (False, 5)
    # allow-on-tie broken: the /src2 tie now resolves to deny
    assert mutated[2] == (False, 5)
    # the no-match default-allow path is aggregate-free and must hold
    assert mutated[3] == (True, None)
    assert mutated != baseline


def test_semdedup_oracle_catches_broken_cosine(spark, sf_dir, monkeypatch):
    # Negate the pair-cosine dot product inside semantic_dedup: every
    # planted copy pair scores -1 instead of ~1, no row is suppressed,
    # and the vec_id%10 IN (1,2) rows come back kept=true — diverging
    # from the driver oracle's brute-force pairwise replay, which would
    # turn the row red.
    from tfx_addons_feast_examplegen_spark.operators import semdedup as sd
    from tfx_addons_feast_examplegen_spark.queries.similarity import (
        _q_semantic_dedup,
    )

    baseline = {
        r["vec_id"]: r["kept"] for r in _q_semantic_dedup(spark, sf_dir).collect()
    }
    planted = [i for i in baseline if i % 10 in (1, 2)]
    assert planted and all(baseline[i] is False for i in planted)
    assert all(v for i, v in baseline.items() if i % 10 not in (1, 2))

    real = sd._dot

    def negated(a, b):
        return -real(a, b)

    monkeypatch.setattr(sd, "_dot", negated)
    mutated = {
        r["vec_id"]: r["kept"] for r in _q_semantic_dedup(spark, sf_dir).collect()
    }
    assert all(mutated[i] is True for i in planted)
    assert mutated != baseline


def test_dsir_oracle_catches_negated_log_ratio(spark, sf_dir, monkeypatch):
    # Negate the bucket log-ratios inside dsir_select: the importance
    # weights invert (target-like docs now score LOWEST), so the Gumbel
    # top-200 flips toward off-target documents and the driver oracle's
    # full SQL replay — which computes the true ratios — must go red.
    from tfx_addons_feast_examplegen_spark.operators import dsir as ds
    from tfx_addons_feast_examplegen_spark.queries.curation import (
        _q_dsir_select,
    )

    baseline = {r["doc_id"] for r in _q_dsir_select(spark, sf_dir).collect()}
    assert len(baseline) == 200

    real = ds.dsir_log_ratios

    def negated(*a, **kw):
        out = real(*a, **kw)
        return out.select(
            "bucket", (-out["log_ratio"]).alias("log_ratio")
        )

    monkeypatch.setattr(ds, "dsir_log_ratios", negated)
    mutated = {r["doc_id"] for r in _q_dsir_select(spark, sf_dir).collect()}
    assert mutated != baseline
    # the flip is substantive, not a one-row boundary wiggle
    assert len(baseline - mutated) > 50


def test_winnowing_oracle_catches_broken_min_selection(spark, monkeypatch):
    # Swap the window minimum for a maximum: winnowing now records the
    # per-window LARGEST gram hash, so the selected fingerprint sets —
    # and every downstream pair score — diverge from the paper
    # algorithm the DuckDB replay implements. Verified against the
    # independent pure-Python reference rather than the unmutated
    # operator, so a bug in BOTH paths cannot self-certify.
    from tests.test_winnowing import ref_winnow

    docs = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "one two three four five six seven eight nine ten"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    want = {(d, h, p) for d, t in docs for (h, p) in ref_winnow(t, 4, 4)}
    got = {
        (r.doc_id, r.fp_hash, r.fp_pos)
        for r in dd.winnow_fingerprints(df, k=4, w=4).collect()
    }
    assert got == want
    real_min = dd.F.min
    monkeypatch.setattr(dd.F, "min", dd.F.max)
    try:
        mutated = {
            (r.doc_id, r.fp_hash, r.fp_pos)
            for r in dd.winnow_fingerprints(df, k=4, w=4).collect()
        }
    finally:
        monkeypatch.setattr(dd.F, "min", real_min)
    assert mutated != want


def test_winnowing_oracle_catches_broken_window_bound(spark, monkeypatch):
    # Break the full-window-start filter (pos <= greatest(1, ng - w + 1))
    # by making greatest() return its ng-derived argument unclamped and
    # the bound one window too wide: the k-1 tail positions now each
    # contribute a partial-window minimum, adding fingerprints the paper
    # algorithm never selects. Verified against the independent
    # pure-Python reference, which implements the correct bound.
    from tests.test_winnowing import ref_winnow

    docs = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "one two three four five six seven eight nine ten"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    want = {(d, h, p) for d, t in docs for (h, p) in ref_winnow(t, 4, 4)}
    got = {
        (r.doc_id, r.fp_hash, r.fp_pos)
        for r in dd.winnow_fingerprints(df, k=4, w=4).collect()
    }
    assert got == want

    real_greatest = dd.F.greatest

    def too_wide(a, b):
        # the filter's only greatest() call: widen the bound past the
        # last full window (the off-by-w this decomposition invites)
        return real_greatest(a, b + dd.F.lit(3))

    monkeypatch.setattr(dd.F, "greatest", too_wide)
    try:
        mutated = {
            (r.doc_id, r.fp_hash, r.fp_pos)
            for r in dd.winnow_fingerprints(df, k=4, w=4).collect()
        }
    finally:
        monkeypatch.setattr(dd.F, "greatest", real_greatest)
    assert mutated != want
    # strictly MORE fingerprints: partial tail windows add selections
    assert mutated > want


def test_dp_noise_oracle_catches_negated_sign(spark, monkeypatch):
    # Negate the Laplace sign term: every group's noise flips around
    # the raw count, so the released values diverge from the
    # inverse-CDF draw the oracle replays — caught by comparing to the
    # independent Python derivation of the same md5 uniform.
    import hashlib
    import math

    from tfx_addons_feast_examplegen_spark.operators import privacy as pv

    rows = [("A", i % 3) for i in range(20)] + [("B", 0)] * 7
    df = spark.createDataFrame(rows, ["g", "v"])

    def ref(group, n, eps, salt):
        u = (
            int(hashlib.md5(f"{group}\x1f{salt}".encode()).hexdigest()[:13], 16)
            + 0.5
        ) / 2**52
        noise = (
            -(1 / eps)
            * math.copysign(1.0, u - 0.5)
            * math.log(1 - 2 * abs(u - 0.5))
        )
        return round(n + noise, 4)

    want = {"A": ref("A", 20, 1.0, "m"), "B": ref("B", 7, 1.0, "m")}
    got = {
        r.g: r.noisy_count
        for r in pv.dp_noisy_counts(df, ["g"], epsilon=1.0, salt="m").collect()
    }
    assert got == want

    real_signum = pv.F.signum
    monkeypatch.setattr(pv.F, "signum", lambda c: -real_signum(c))
    try:
        mutated = {
            r.g: r.noisy_count
            for r in pv.dp_noisy_counts(
                df, ["g"], epsilon=1.0, salt="m"
            ).collect()
        }
    finally:
        monkeypatch.setattr(pv.F, "signum", real_signum)
    assert mutated != want
    # the flip mirrors the noise around the raw count exactly
    assert mutated["A"] == round(2 * 20 - want["A"], 4)


def test_target_encode_oracle_catches_fold_drift(spark, sf_dir, monkeypatch):
    # Swap the fold hash for a different (still deterministic) one: fold
    # assignment now disagrees with the oracle's Knuth spelling, so both
    # the fold column and every out-of-fold statistic move — the driver
    # comparison reddens on the first row. This is the likeliest silent
    # break for this entry (the encoding arithmetic is pinned by its own
    # pytest; the hash is shared convention with the split family).
    from tfx_addons_feast_examplegen_spark.operators import curation as cu
    from tfx_addons_feast_examplegen_spark.queries.curation import (
        _q_target_encode,
    )

    baseline = {
        r.c_custkey: (r.fold, r.te)
        for r in _q_target_encode(spark, sf_dir).collect()
    }
    assert len(baseline) > 0

    real_bucket = cu.fingerprint_bucket
    monkeypatch.setattr(
        cu, "fingerprint_bucket",
        lambda key, total: real_bucket(key + F.lit(1), total),
    )
    try:
        mutated = {
            r.c_custkey: (r.fold, r.te)
            for r in _q_target_encode(spark, sf_dir).collect()
        }
    finally:
        monkeypatch.setattr(cu, "fingerprint_bucket", real_bucket)
    assert mutated != baseline
    moved = sum(1 for k in baseline if baseline[k][0] != mutated[k][0])
    assert moved > len(baseline) // 2  # wholesale drift, not a wiggle


def test_ivm_delta_join_oracle_catches_dropped_cross_term(spark, monkeypatch):
    # Forget dA x dB (use B instead of B + dB in the first term) — THE
    # classic IVM bug: rows where both sides arrived in the same batch
    # vanish from the delta. Caught by the maintenance property the
    # driver oracle encodes (full-minus-full EXCEPT ALL): the mutated
    # delta is a strict subset missing exactly the dA x dB pairs.
    from collections import Counter

    from tfx_addons_feast_examplegen_spark.operators import ivm

    a = spark.createDataFrame([(1, "a1"), (2, "a2")], ["k", "va"])
    da = spark.createDataFrame([(3, "a3")], ["k", "va"])
    b = spark.createDataFrame([(1, "b1")], ["k", "vb"])
    db = spark.createDataFrame([(2, "b2"), (3, "b3")], ["k", "vb"])

    def bag(rows):
        return Counter(tuple(r) for r in rows)

    want = bag(
        a.unionByName(da).join(b.unionByName(db), "k")
        .select("k", "va", "vb").collect()
    ) - bag(a.join(b, "k").select("k", "va", "vb").collect())
    got = bag(ivm.delta_join(a, da, b, db, ["k"]).collect())
    assert got == want
    assert (3, "a3", "b3") in got  # the cross-term pair is present

    # mutate: the FIRST unionByName call inside delta_join builds
    # B + dB; make it return the bare base instead (call-order seam —
    # delta_join's only other unionByName is the final output union)
    # Spark 4: runtime frames are the CLASSIC DataFrame subclass, which
    # overrides unionByName — patch the instance's class, not the base
    cls = type(a)
    real_union = cls.unionByName
    state = {"first": True}

    def drop_first_union(self, other, *args, **kwargs):
        if state["first"]:
            state["first"] = False
            return self
        return real_union(self, other, *args, **kwargs)

    monkeypatch.setattr(cls, "unionByName", drop_first_union)
    try:
        mutated = bag(ivm.delta_join(a, da, b, db, ["k"]).collect())
    finally:
        monkeypatch.setattr(cls, "unionByName", real_union)
    assert mutated != want
    missing = want - mutated
    assert set(missing) == {(3, "a3", "b3")}  # exactly the dAxdB pairs


def test_cc_incremental_oracle_catches_dropped_contraction(spark, monkeypatch):
    # Skip the endpoint->label contraction (map new edges through RAW
    # ids instead of cluster representatives): two old components
    # joined indirectly — new edges touching different MEMBERS of the
    # same old cluster — no longer share a super-node, so the merged
    # labeling splits and diverges from the from-scratch closure the
    # driver oracle computes.
    from tfx_addons_feast_examplegen_spark.operators import corpus as cp

    old = spark.createDataFrame([(1, 2), (3, 4)], ["doc_a", "doc_b"])
    labels = cp.connected_components(old)
    # 2-5 and 5-3: merges {1,2} and {3,4} THROUGH new node 5
    new = spark.createDataFrame([(2, 5), (5, 3)], ["doc_a", "doc_b"])
    want = {
        (r.doc_id, r.cluster)
        for r in cp.connected_components(
            old.unionByName(new)
        ).collect()
    }
    got = {
        (r.doc_id, r.cluster)
        for r in cp.connected_components_incremental(labels, new).collect()
    }
    assert got == want

    real_coalesce = cp.F.coalesce
    state = {"n": 0}

    def drop_label_mapping(*cols):
        # the first two coalesce calls inside the incremental operator
        # are the endpoint->label lookups (sa, sb); make them ignore
        # the label and keep the raw id
        state["n"] += 1
        if state["n"] <= 2:
            return real_coalesce(cols[-1])
        return real_coalesce(*cols)

    monkeypatch.setattr(cp.F, "coalesce", drop_label_mapping)
    try:
        mutated = {
            (r.doc_id, r.cluster)
            for r in cp.connected_components_incremental(
                labels, new
            ).collect()
        }
    finally:
        monkeypatch.setattr(cp.F, "coalesce", real_coalesce)
    assert mutated != want
    # the split is substantive: node 4 no longer reaches cluster 1
    assert (4, 1) in want and (4, 1) not in mutated


def test_bootstrap_oracle_catches_percentile_off_by_one(spark, monkeypatch):
    # Shift the discrete percentile index by one: both CI bounds move to
    # neighboring order statistics, diverging from the ceil(q * n)
    # selection the oracle replays.
    from tfx_addons_feast_examplegen_spark.operators import stats as st

    rows = [(i, (i * 37) % 100) for i in range(150)]
    df = spark.createDataFrame(rows, ["id", "v"])
    base = st.bootstrap_metric_ci(df, "v", "id", replicates=60).collect()[0]

    real_ceil = st.F.ceil
    monkeypatch.setattr(st.F, "ceil", lambda c: real_ceil(c) + st.F.lit(1))
    try:
        mutated = st.bootstrap_metric_ci(
            df, "v", "id", replicates=60
        ).collect()[0]
    finally:
        monkeypatch.setattr(st.F, "ceil", real_ceil)
    assert (mutated.ci_lo, mutated.ci_hi) != (base.ci_lo, base.ci_hi)
    # shifted UP the sorted replicate array: bounds can only grow
    assert mutated.ci_lo >= base.ci_lo and mutated.ci_hi >= base.ci_hi


def test_nb_oracle_catches_cost_drift(spark, monkeypatch):
    # The entry exposes the winner's exact micro-nat cost, so ANY drift
    # in the fit arithmetic — smoothing, priors, bucket hash — reddens
    # the oracle even when no boundary prediction flips. Perturb every
    # -log(p) cost (the way a broken smoothing constant would) and
    # assert the exposed costs move while the reference pins the
    # unmutated ones.
    from tests.test_naive_bayes import TEST, TRAIN, _ref

    from tfx_addons_feast_examplegen_spark.operators import text as tx

    train = spark.createDataFrame(TRAIN, ["doc_id", "y", "text"])
    test = spark.createDataFrame(TEST, ["doc_id", "y", "text"])
    ref = _ref(TRAIN, TEST)
    base = {
        r.doc_id: r.cost_micronats
        for r in tx.naive_bayes_fit_score(
            train, test, "y", "text", "doc_id", n_buckets=64
        ).collect()
    }
    assert base == {i: v[3] for i, v in ref.items()}

    real_log = tx.F.log
    monkeypatch.setattr(tx.F, "log", lambda col: real_log(col * tx.F.lit(0.5)))
    try:
        mutated = {
            r.doc_id: r.cost_micronats
            for r in tx.naive_bayes_fit_score(
                train, test, "y", "text", "doc_id", n_buckets=64
            ).collect()
        }
    finally:
        monkeypatch.setattr(tx.F, "log", real_log)
    assert mutated != base
    # halving every probability ADDS ln(2) micro-nats per cost term
    assert all(mutated[i] > base[i] for i in base)


def test_dsir_oracle_catches_broken_gumbel_noise(spark, sf_dir, monkeypatch):
    # Invert the deterministic uniform draw behind the Gumbel keys
    # (u -> 1 - u, via the fingerprint the noise is a pure function
    # of): the WOR tie-breaking noise now ranks documents in the
    # opposite order, so boundary selections flip while the importance
    # weights stay correct — exactly the replay-drift the driver
    # oracle's full SQL reconstruction of key = log_w + g(u) catches.
    from tfx_addons_feast_examplegen_spark.operators import dsir as ds
    from tfx_addons_feast_examplegen_spark.queries.curation import (
        _q_dsir_select,
    )

    baseline = {r["doc_id"] for r in _q_dsir_select(spark, sf_dir).collect()}
    assert len(baseline) == 200

    real = ds.fingerprint_bucket

    def inverted(col, denom):
        return F.lit(denom - 1) - real(col, denom)

    monkeypatch.setattr(ds, "fingerprint_bucket", inverted)
    mutated = {r["doc_id"] for r in _q_dsir_select(spark, sf_dir).collect()}
    assert mutated != baseline, "noise inversion must move the selection"


def test_semdedup_oracle_catches_inverted_suppression_order(
    spark, sf_dir, monkeypatch
):
    # Swap the pair orientation semantic_dedup's suppression reads
    # (doc_a <-> doc_b): the paper's rule suppresses the LATER row in
    # (centroid_sim ASC, id ASC) order; inverted, the EARLIER row of
    # every near-dup pair is marked instead — on the planted
    # identical-direction groups (centroid_sim ties, id tie-break)
    # that keeps the copy and drops the base, diverging from the
    # driver oracle's replay of the ASC rule.
    from tfx_addons_feast_examplegen_spark.operators import semdedup as sd
    from tfx_addons_feast_examplegen_spark.queries.similarity import (
        _q_semantic_dedup,
    )

    baseline = {
        r["vec_id"]: r["kept"]
        for r in _q_semantic_dedup(spark, sf_dir).collect()
    }
    planted = sorted(i for i in baseline if i % 10 in (1, 2))
    assert planted and all(baseline[i] is False for i in planted)

    real = sd._bucket_pairs

    def swapped(*a, **kw):
        out = real(*a, **kw)
        return out.select(
            F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
        )

    monkeypatch.setattr(sd, "_bucket_pairs", swapped)
    mutated = {
        r["vec_id"]: r["kept"]
        for r in _q_semantic_dedup(spark, sf_dir).collect()
    }
    assert mutated != baseline
    # inverted order suppresses the EARLIER members of each planted
    # {base, copy, scaled-copy} group: the base (id b) flips to
    # suppressed, the last member (the %10==2 scaled copy) flips to
    # kept, and the middle copy stays suppressed via the swapped
    # (copy, scaled) pair — so every planted group moves.
    assert all(mutated[i] is True for i in planted if i % 10 == 2)
    assert all(mutated[i - 2] is False for i in planted if i % 10 == 2)


def test_pseudonymize_oracle_catches_salt_misuse(spark, sf_dir, monkeypatch):
    # Two regressions the FK-audit entry must catch:
    # (a) per-table salt mismatch — referential integrity collapses,
    #     the released join goes empty and the row count diverges;
    # (b) salt silently DROPPED — joins still line up (consistent
    #     surrogate), counts and cents stay correct, and only the
    #     pk_checksum column (the salt-sensitivity contract) reddens.
    from tfx_addons_feast_examplegen_spark.operators import privacy as pv
    from tfx_addons_feast_examplegen_spark.queries.curation import (
        _q_pseudonymize,
    )

    base = {
        r["c_nationkey"]: (r["n_orders"], r["pk_checksum"])
        for r in _q_pseudonymize(spark, sf_dir).collect()
    }
    assert len(base) == 25

    real_tables = pv.pseudonymize_tables

    def mismatched(tables, *, salt, **kw):
        out = {}
        for i, (name, spec) in enumerate(tables.items()):
            out.update(real_tables({name: spec}, salt=f"{salt}-{i}", **kw))
        return out

    monkeypatch.setattr(pv, "pseudonymize_tables", mismatched)
    assert _q_pseudonymize(spark, sf_dir).count() == 0  # (a)

    real_key = pv.pseudonymize_key

    def saltless(col, *, salt, bits=60):
        return real_key(col, salt="", bits=bits)

    monkeypatch.setattr(pv, "pseudonymize_tables", real_tables)
    monkeypatch.setattr(pv, "pseudonymize_key", saltless)
    dropped = {
        r["c_nationkey"]: (r["n_orders"], r["pk_checksum"])
        for r in _q_pseudonymize(spark, sf_dir).collect()
    }
    assert {k: v[0] for k, v in dropped.items()} == {
        k: v[0] for k, v in base.items()
    }, "counts are salt-invariant — they must NOT be the catch"
    assert any(
        dropped[k][1] != base[k][1] for k in base
    ), "pk_checksum must redden when the salt is dropped"  # (b)


def test_semantic_gate_oracle_catches_broken_co_assignment(
    spark, sf_dir, monkeypatch
):
    # Offset the stream side's probed cells by one: arriving copies no
    # longer land in their corpus twin's cell, the stream-static join
    # finds nothing, and the driver oracle's full cross-cosine replay
    # (which has one row per planted pair) reddens on row count. The
    # index side and the exact cosine predicate run unmodified — the
    # mutation isolates the co-assignment guarantee the gate rests on.
    from tfx_addons_feast_examplegen_spark.operators import semdedup as sd
    from tfx_addons_feast_examplegen_spark.queries.streaming import (
        _q_stream_semantic_gate,
    )

    baseline = _q_stream_semantic_gate(spark, sf_dir).collect()
    assert len(baseline) == 20  # the planted copies, sf0.001
    assert all(r["cos"] == 1.0 for r in baseline)

    real = sd.ivf_assign

    calls = {"n": 0}

    def shifted(df, cents, **kw):
        calls["n"] += 1
        out = real(df, cents, **kw)
        if calls["n"] > 1:  # 1st call = index build; later = stream probes
            out = out.withColumn(
                "cell", (F.col("cell") + 1) % F.lit(len(cents))
            )
        return out

    monkeypatch.setattr(sd, "ivf_assign", shifted)
    mutated = _q_stream_semantic_gate(spark, sf_dir).collect()
    assert len(mutated) < len(baseline)  # oracle rows_match would go red
