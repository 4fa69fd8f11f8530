"""PNG codec (sources/png.py): round-trip, filter coverage, CRC
verification, and the registered hash-checked decode op."""

from __future__ import annotations

import pytest

from cs_pipeline_spark.sources.png import (
    _img_dims,
    _img_pixel,
    _N_IMGS,
    decode_png,
    encode_png,
    mm_decode_png,
)


def _pix(w, h, ch, seed=0):
    return [
        (y * 31 + x * 17 + c * 11 + seed * 7) % 256
        for y in range(h)
        for x in range(w)
        for c in range(ch)
    ]


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("ch", [1, 3])
def test_roundtrip_each_filter(ftype, ch):
    w, h = 7, 5
    pix = _pix(w, h, ch)
    payload = encode_png(w, h, ch, pix, filters=[ftype] * h)
    gw, gh, gch, got = decode_png(payload)
    assert (gw, gh, gch) == (w, h, ch)
    assert got == pix


def test_roundtrip_mixed_filters():
    w, h, ch = 9, 10, 3
    pix = _pix(w, h, ch, seed=3)
    payload = encode_png(w, h, ch, pix, filters=[y % 5 for y in range(h)])
    assert decode_png(payload)[3] == pix


def test_crc_corruption_detected():
    payload = bytearray(encode_png(3, 3, 1, _pix(3, 3, 1)))
    # flip a byte inside the IDAT data (after sig+IHDR chunk)
    payload[8 + 12 + 13 + 20] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(payload))


def test_bad_signature_rejected():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\x89PNX\r\n\x1a\n" + b"\x00" * 32)


def test_pil_agrees_if_available():
    try:
        import io

        from PIL import Image
    except ImportError:
        pytest.skip("PIL not installed in this container")
    w, h, ch = 6, 4, 3
    pix = _pix(w, h, ch, seed=1)
    img = Image.open(io.BytesIO(encode_png(w, h, ch, pix, [4] * h)))
    assert list(img.tobytes()) == pix


def test_op_matches_formula(spark, sf_dir):
    rows = {r.fname: r for r in mm_decode_png(spark, sf_dir).collect()}
    assert len(rows) == _N_IMGS
    for i in range(_N_IMGS):
        w, h, ch = _img_dims(i)
        r = rows[f"img-{i:03d}.png"]
        assert (r.width, r.height, r.channels) == (w, h, ch)
        vals = [
            _img_pixel(i, y, x, c)
            for y in range(h)
            for x in range(w)
            for c in range(ch)
        ]
        assert r.n_px == len(vals)
        assert r.px_sum == sum(vals)
        assert r.px_min == min(vals) and r.px_max == max(vals)


# ---------- perceptual dHash (round 8) ----------


def test_dhash_matches_formula(spark, sf_dir):
    """Recompute every hash and pairwise Hamming distance from the
    pixel formula in plain python."""
    from cs_pipeline_spark.sources.png import (
        _DH_G,
        _N_IMGS,
        _img_dims,
        _img_pixel,
        mm_image_dhash,
    )

    def luma(i, y, x):
        w, h, ch = _img_dims(i)
        if ch == 1:
            return _img_pixel(i, y, x, 0)
        return (
            299 * _img_pixel(i, y, x, 0)
            + 587 * _img_pixel(i, y, x, 1)
            + 114 * _img_pixel(i, y, x, 2)
        ) // 1000

    bits = {}
    for i in range(_N_IMGS):
        w, h, _ = _img_dims(i)
        bits[i] = [
            1
            if luma(i, j * h // _DH_G, (k + 1) * w // _DH_G)
            > luma(i, j * h // _DH_G, k * w // _DH_G)
            else 0
            for j in range(_DH_G)
            for k in range(_DH_G - 1)
        ]
    want_hash = {
        i: sum(b << p for p, b in enumerate(bits[i])) for i in bits
    }
    rows = mm_image_dhash.__wrapped__(spark, sf_dir).collect()
    assert len(rows) == _N_IMGS * (_N_IMGS - 1) // 2
    for r in rows:
        ia = int(r.fname_a[4:7])
        ib = int(r.fname_b[4:7])
        assert r.dhash_a == want_hash[ia]
        assert r.dhash_b == want_hash[ib]
        assert r.hamming == sum(
            x != y for x, y in zip(bits[ia], bits[ib])
        )
        assert 0 <= r.hamming <= _DH_G * (_DH_G - 1)
