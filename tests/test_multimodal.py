"""Multimodal decode tests — the PNG decoder is REAL (stdlib zlib), so
these are value-checked against independently computed pixels, not
plumbing-only row counts."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from dbt_glue_spark.extensions.multimodal import (
    DecodeUnavailable,
    _PNG_SIG,
    _paeth,
    extract_features,
    image_features,
    png_decode,
    png_encode,
    synth_media_table,
    synth_png,
)


def _gradient(w: int, h: int, ch: int, seed: int = 0) -> bytes:
    px = bytearray(w * h * ch)
    for r in range(h):
        for c in range(w):
            for k in range(ch):
                px[(r * w + c) * ch + k] = (r * 7 + c * 13 + k * 29 + seed) % 256
    return bytes(px)


@pytest.mark.parametrize("ch", [1, 3, 4])
def test_png_roundtrip(ch):
    w, h = 17, 9  # odd sizes catch stride bugs
    px = _gradient(w, h, ch)
    out = png_decode(png_encode(w, h, px, channels=ch))
    assert out == (w, h, ch, px)


def _forward_filter(px: bytes, w: int, h: int, ch: int, ftype: int) -> bytes:
    """Apply a PNG scanline filter (encoder side) so the decoder's
    reconstruction can be verified against the original pixels."""
    stride = w * ch
    raw = bytearray()
    prev = bytes(stride)
    for r in range(h):
        line = px[r * stride : (r + 1) * stride]
        raw.append(ftype)
        for i in range(stride):
            left = line[i - ch] if i >= ch else 0
            up = prev[i]
            ul = prev[i - ch] if i >= ch else 0
            pred = {
                0: 0,
                1: left,
                2: up,
                3: (left + up) >> 1,
                4: _paeth(left, up, ul),
            }[ftype]
            raw.append((line[i] - pred) & 0xFF)
        prev = line
    return bytes(raw)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_decode_all_filters(ftype):
    w, h, ch = 11, 6, 3
    px = _gradient(w, h, ch, seed=ftype)
    raw = _forward_filter(px, w, h, ch, ftype)

    def chunk(typ, payload):
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert png_decode(data) == (w, h, ch, px)


def test_non_png_raises_and_features_fall_back():
    with pytest.raises(DecodeUnavailable):
        png_decode(b"RIFF....WAVEfmt ")
    feats = image_features(b"not an image at all")
    assert len(feats) == 8 and all(-1.0 <= f <= 1.0 for f in feats)


def test_image_features_match_numpy_recompute():
    w, h = 20, 10
    png = synth_png(3, w, h)
    feats = image_features(png)
    assert feats[:3] == [float(w), float(h), 3.0]
    _, _, _, px = png_decode(png)
    arr = np.frombuffer(px, dtype=np.uint8).reshape(-1, 3).astype(np.float64)
    lum = 0.299 * arr[:, 0] + 0.587 * arr[:, 1] + 0.114 * arr[:, 2]
    assert feats[3] == pytest.approx(lum.mean() / 255.0)
    assert feats[4] == pytest.approx(lum.std() / 255.0)
    assert sum(feats[5:8]) == pytest.approx(1.0)


def test_extract_features_decodes_images_for_real(spark):
    media = synth_media_table(spark, n=12)
    rows = {r["media_id"]: r for r in extract_features(media).collect()}
    assert len(rows) == 12
    for i, r in rows.items():
        if r["kind"] == "image":
            # width/height recovered from ACTUAL pixel decode, matching the
            # metadata columns the synth table declared
            w, h = 64 + i % 32, 64 + (i * 7) % 32
            assert r["feature"][0] == float(w)
            assert r["feature"][1] == float(h)
            assert r["feature"][2] == 3.0
        else:
            assert len(r["feature"]) == 8  # opaque fallback features
        assert r["n_bytes"] > 0 and r["content_sha"] is not None


def test_png_roundtrip_property():
    # property-based: any size/channel/pixel combination survives the
    # encode→decode loop bit-exactly
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=24),
        h=st.integers(min_value=1, max_value=24),
        ch=st.sampled_from([1, 3, 4]),
        seed=st.integers(min_value=0, max_value=2**32 - 1),
    )
    def roundtrip(w, h, ch, seed):
        rnd = np.random.RandomState(seed)
        px = rnd.randint(0, 256, size=w * h * ch, dtype=np.uint8).tobytes()
        assert png_decode(png_encode(w, h, px, channels=ch)) == (w, h, ch, px)

    roundtrip()


def test_resize_images_downscales_and_passes_through(spark):
    from dbt_glue_spark.extensions.multimodal import (
        png_decode,
        resize_images,
        synth_media_table,
    )

    media = synth_media_table(spark, n=24)
    out = resize_images(media, max_side=32).collect()
    assert len(out) == 24
    by_status = {}
    for r in out:
        by_status.setdefault(r.resized, []).append(r)
    # audio/video rows pass through untouched
    assert all(r.kind != "image" for r in by_status.get("passthrough", [])) or any(
        r.kind == "image" for r in by_status.get("passthrough", [])
    )
    resized = by_status.get("resized", [])
    assert resized, "synth images are 64-95px → must downscale at max_side=32"
    for r in resized:
        w, h, ch, px = png_decode(bytes(r.content))
        assert max(w, h) <= 32 and (r.width, r.height) == (w, h)
        assert len(px) == w * h * ch
    # deterministic: same input → byte-identical output
    again = {r.media_id: r for r in resize_images(media, max_side=32).collect()}
    for r in resized:
        assert bytes(again[r.media_id].content) == bytes(r.content)


# ---- round-4: real WAV audio decode ----------------------------------------


def test_wav_roundtrip_and_closed_form_features():
    from dbt_glue_spark.extensions.multimodal import (
        audio_features,
        synth_wav,
        wav_decode,
    )

    for i in (0, 1, 4, 7, 13):
        dur_s, amp, hp = 1 + i % 10, 1000 * (1 + i % 5), 2 + i % 6
        n = 8000 * dur_s
        wav = synth_wav(i)
        # stdlib wave writes the canonical 44-byte PCM header — the
        # closed-form byte size the oracle SQL relies on
        assert len(wav) == 44 + 2 * n
        sr, nch, x = wav_decode(wav)
        assert (sr, nch, x.size) == (8000, 1, n)
        # independently recompute the square wave
        k = np.arange(n)
        expected = np.where((k // hp) % 2 == 0, amp, -amp)
        assert (x == expected).all()
        feats = audio_features(wav)
        # square wave: RMS = peak = amplitude; sign flips every hp samples
        assert feats[0] == float(n) and feats[1] == 8000.0 and feats[2] == 1.0
        assert feats[3] == amp / 32768.0  # exact: amp * 2^-15
        assert feats[4] == amp / 32768.0
        assert feats[5] == float((n - 1) // hp)
        assert feats[6] == pytest.approx(((n - 1) // hp) / (n - 1))


def test_audio_features_fall_back_on_non_wav():
    from dbt_glue_spark.extensions.multimodal import (
        _fake_feature,
        audio_features,
        wav_decode,
    )

    junk = b"definitely not a wav"
    assert audio_features(junk) == _fake_feature(junk)
    with pytest.raises(DecodeUnavailable):
        wav_decode(junk)


def test_extract_features_decodes_audio_for_real(spark):
    media = synth_media_table(spark, n=12)
    rows = {r["media_id"]: r for r in extract_features(media).collect()}
    for i, r in rows.items():
        if r["kind"] == "audio":
            n = 8000 * (1 + i % 10)
            amp, hp = 1000 * (1 + i % 5), 2 + i % 6
            assert r["feature"][0] == float(n)
            assert r["feature"][3] == amp / 32768.0
            assert r["feature"][5] == float((n - 1) // hp)
            assert r["n_bytes"] == 44 + 2 * n


def test_resample_audio_halves_samples_and_preserves_waveform():
    from dbt_glue_spark.extensions.multimodal import (
        resample_audio,
        synth_wav,
        wav_decode,
    )

    wav = synth_wav(4)  # 5 s, amp 5000, hp 6
    out, rate, nsamp, did = resample_audio(wav, 4000)
    assert did and rate == 4000 and nsamp == 4000 * 5
    sr2, nch2, y = wav_decode(out)
    assert (sr2, nch2, y.size) == (4000, 1, nsamp)
    # nearest-neighbor pick: y[j] must equal x[floor(j * 8000/4000)]
    _, _, x = wav_decode(wav)
    idx = (np.arange(nsamp) * 2).astype(int)
    assert (np.asarray(y) == np.asarray(x)[idx]).all()
    # already at/below target → pass-through, original bytes
    out2, rate2, n2, did2 = resample_audio(out, 4000)
    assert not did2 and out2 == out and rate2 == 4000


def test_resample_audios_passes_non_audio_through(spark):
    from dbt_glue_spark.extensions.multimodal import resample_audios

    media = synth_media_table(spark, n=12)
    rows = {r["media_id"]: r for r in resample_audios(media, 4000).collect()}
    assert len(rows) == 12
    for i, r in rows.items():
        if r["kind"] == "audio":
            assert r["resampled"] == "resampled"
            assert r["sample_rate"] == 4000
            assert r["n_samples"] == 4000 * (1 + i % 10)
        else:
            assert r["resampled"] == "passthrough"
            assert r["sample_rate"] is None


# ---- video (PNGV container) — REAL frame decode ---------------------------


def test_video_roundtrip_and_closed_form_features():
    from dbt_glue_spark.extensions.multimodal import (
        synth_video,
        video_decode,
        video_features,
    )

    for i in (2, 5, 11):
        data = synth_video(i)
        fps, frames = video_decode(data)
        assert fps == 2
        assert len(frames) == 2 * (1 + i % 10)
        # every frame is an independently decodable PNG with the spec color
        for f, fb in enumerate(frames):
            w, h, ch, px = png_decode(fb)
            assert (w, h, ch) == (16, 12, 3)
            base = (i * 7 + f * 13) % 256
            arr = np.frombuffer(px, dtype=np.uint8).reshape(-1, 3)
            assert int(arr[:, 0].max()) == int(arr[:, 0].min()) == base
            assert int(arr[:, 1].min()) == (base + 11) % 256
            assert int(arr[:, 2].min()) == (base + 22) % 256
        feats = video_features(data)
        n = 2 * (1 + i % 10)
        assert feats[0] == float(n) and feats[1] == 2.0
        assert feats[2] == 16.0 and feats[3] == 12.0
        # channel means over all frames, float32-rounded like the schema
        exp_r = np.float32(
            sum((i * 7 + f * 13) % 256 for f in range(n)) / n
        )
        assert np.float32(feats[4]) == exp_r


def test_video_decode_rejects_garbage_and_truncation():
    from dbt_glue_spark.extensions.multimodal import (
        synth_video,
        video_decode,
        video_features,
    )

    with pytest.raises(DecodeUnavailable):
        video_decode(b"\x00" * 32)
    whole = synth_video(3)
    with pytest.raises(DecodeUnavailable):
        video_decode(whole[: len(whole) // 2])  # truncated payload
    # featurizer falls back to opaque features instead of failing the batch
    assert len(video_features(b"not a video")) == 8


def test_decode_sampled_frames_picks_and_clamps(spark):
    from dbt_glue_spark.extensions.multimodal import (
        decode_sampled_frames,
        synth_media_table,
    )

    media = synth_media_table(spark, n=12)
    # every_ms=1500 at 2 fps: ts 0→frame 0, 1500→frame 3, 3000→frame 6 ...
    out = decode_sampled_frames(media, every_ms=1500).collect()
    assert out, "video rows must decode"
    for r in out:
        i, ts = r["media_id"], r["frame_ts_ms"]
        assert i % 3 == 2  # only video rows survive the stage
        n_frames = 2 * (1 + i % 10)
        assert r["frame_idx"] == min(n_frames - 1, ts * 2 // 1000)
        assert (r["width"], r["height"]) == (16, 12)
        assert r["mean_r"] == float((i * 7 + r["frame_idx"] * 13) % 256)


def test_decode_sampled_frames_skips_undecodable(spark):
    from dbt_glue_spark.extensions.multimodal import (
        MEDIA_SCHEMA,
        decode_sampled_frames,
        synth_video,
    )

    rows = [
        (0, "video", synth_video(0), "video/x-pngv", 16, 12, 1000),
        (1, "video", b"garbage-bytes", "video/mp4", 16, 12, 1000),
        (2, "video", None, "video/mp4", 16, 12, 1000),
        (3, "image", b"not-used", "image/png", 8, 8, None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = decode_sampled_frames(df, every_ms=500).collect()
    assert {r["media_id"] for r in out} == {0}  # bad rows skipped, not fatal
