"""Round-10 operator semantics: the real WAV codec, the DoReMi
sample composition, and this round's regression pins."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from crypto_etl_pipeline_spark.queries import REGISTRY

SF_GATE = "/root/testdata/sf0.01"


# --- real RIFF/WAVE codec (r9 VERDICT task #5) ----------------------------


@pytest.mark.quick
def test_wav_roundtrip_exact():
    """wav_serialize -> wav_decode is lossless: header fields and every
    PCM frame survive the byte round-trip."""
    import numpy as np

    from crypto_etl_pipeline_spark.multimodal.binary import wav_decode, wav_serialize

    payload = wav_serialize(doc_id=42, src_rate=12_000, n_samples=100)
    rate, channels, samples = wav_decode(payload)
    assert (rate, channels, len(samples)) == (12_000, 1, 100)
    j = np.arange(100, dtype=np.int64)
    expect = (42 * 31 + j * 7) % 65536 - 32768
    assert (samples.astype(np.int64) == expect).all()


@pytest.mark.quick
def test_wav_decode_walks_chunks():
    """The parser is a real chunk walker, not an offset-44 assumption:
    a LIST chunk (odd-sized, exercising word alignment) inserted
    between 'fmt ' and 'data' must not break the parse."""
    import struct

    from crypto_etl_pipeline_spark.multimodal.binary import wav_decode, wav_serialize

    base = wav_serialize(doc_id=7, src_rate=8_000, n_samples=10)
    fmt_end = 12 + 8 + 16  # RIFF hdr + fmt chunk
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad to even
    patched = base[:fmt_end] + extra + base[fmt_end:]
    rate, _channels, samples = wav_decode(patched)
    assert rate == 8_000
    assert len(samples) == 10
    r0, _c0, s0 = wav_decode(base)
    assert (samples == s0).all() and rate == r0


@pytest.mark.quick
def test_wav_decode_rejects_non_pcm():
    """Honest codec boundary: float WAV (format 3) and 8-bit depth
    raise instead of silently mis-decoding."""
    import struct

    from crypto_etl_pipeline_spark.multimodal.binary import wav_decode, wav_serialize

    base = bytearray(wav_serialize(doc_id=1, src_rate=8_000, n_samples=4))
    fmt_body = 12 + 8  # offset of fmt chunk body
    base[fmt_body : fmt_body + 2] = struct.pack("<H", 3)  # IEEE float
    with pytest.raises(ValueError, match="format"):
        wav_decode(bytes(base))
    base[fmt_body : fmt_body + 2] = struct.pack("<H", 1)
    base[fmt_body + 14 : fmt_body + 16] = struct.pack("<H", 8)  # 8-bit
    with pytest.raises(ValueError, match="bit depth"):
        wav_decode(bytes(base))
    with pytest.raises(ValueError, match="RIFF"):
        wav_decode(b"P6\n1 1\n255\nxxx")


@pytest.mark.quick
def test_zoh_resample_arithmetic():
    """out_n = n*dst//src and output[i] = input[i*src//dst], downsample
    and upsample both."""
    import numpy as np

    from crypto_etl_pipeline_spark.multimodal.binary import resample_pcm_zoh

    s = np.arange(10, dtype=np.int16)
    down = resample_pcm_zoh(s, src_rate=10_000, dst_rate=4_000)
    assert list(down) == [0, 2, 5, 7]  # floor(i*10/4)
    up = resample_pcm_zoh(s, src_rate=4_000, dst_rate=10_000)
    assert len(up) == 25
    assert list(up[:5]) == [0, 0, 0, 1, 1]  # floor(i*4/10)


# --- DoReMi weight -> sample composition (r9 VERDICT task #6) -------------


def test_doremi_sample_draws_under_updated_weights(spark):
    """The composed query's rates must follow the UPDATE's weights
    (rate == min(1, BUDGET*w_new/n_docs) per source, w_new matching
    corpus_mix_doremi_update), and the realized sample must track
    rate*n_docs within hash-Bernoulli noise."""
    from crypto_etl_pipeline_spark.queries.text import DOREMI_BUDGET

    upd = {
        r["source"]: r
        for r in REGISTRY["corpus_mix_doremi_update"].fn(spark, SF_GATE).collect()
    }
    smp = REGISTRY["corpus_mix_doremi_sample"].fn(spark, SF_GATE).collect()
    assert {r["source"] for r in smp} == set(upd)
    total_drawn = 0
    for r in smp:
        u = upd[r["source"]]
        assert r["n_docs"] == u["n_docs"]
        assert r["w_new"] == pytest.approx(u["w_new"], abs=2e-6)
        expect_rate = min(1.0, DOREMI_BUDGET * u["w_new"] / u["n_docs"])
        # u["w_new"] is display-rounded to 6 dp; through BUDGET/n_docs
        # that half-ULP grows to 0.5e-6 * BUDGET/n_docs
        tol = 2e-6 + 0.5e-6 * DOREMI_BUDGET / u["n_docs"]
        assert r["rate"] == pytest.approx(expect_rate, abs=tol)
        assert 0 <= r["n_sampled"] <= r["n_docs"]
        # hash gate is uniform: realized count within ~4 sigma of rate*n
        mu = r["rate"] * r["n_docs"]
        sigma = (mu * max(1 - r["rate"], 0.05)) ** 0.5
        assert abs(r["n_sampled"] - mu) <= 4 * sigma + 2
        total_drawn += r["n_sampled"]
    # the budget conversion targets ~BUDGET docs overall (clipped
    # sources can only pull it BELOW the budget)
    assert total_drawn <= DOREMI_BUDGET * 1.2
    assert total_drawn >= DOREMI_BUDGET * 0.6


def test_wav_query_rate_actually_read_from_header(spark):
    """A decoder that ignored the header and assumed one rate would
    still produce SOME rows — assert the query's rates span the five
    synthesized values AND that out/in ratios track each rate."""
    rows = REGISTRY["multimodal_real_resample_wav"].fn(spark, SF_GATE).collect()
    assert len(rows) == 500
    rates = {r["src_rate"] for r in rows}
    assert rates == {8_000, 10_000, 12_000, 14_000, 16_000}
    for r in rows:
        assert r["out_samples"] == r["n_samples"] * 4_000 // r["src_rate"]
        assert r["duration_ms"] == r["out_samples"] * 1_000 // 4_000
