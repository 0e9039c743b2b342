"""FITS writer/parser unit tests + the scan's Spark plumbing.

The oracle gate proves the nation round-trip; these tests pin the parts
the oracle can't see: numeric TFORM coverage (K/E/D/I), multi-HDU
walks that must SKIP image extensions by exact size arithmetic, string
padding semantics, malformed-header failure, and the header-only walk.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from analyse_the_sky_with_apache_spark_spark.sources.fits import (
    parse_fits_bintables,
    parse_fits_headers,
    write_fits_bintable,
    _BLOCK,
    _card,
    _pad,
)


def _roundtrip(tmp_path, names, formats, rows):
    path = os.path.join(tmp_path, "t.fits")
    write_fits_bintable(path, names, formats, rows)
    with open(path, "rb") as fh:
        buf = fh.read()
    return buf, list(parse_fits_bintables(buf))


def test_all_numeric_tforms_roundtrip(tmp_path):
    rows = [(-(2**40), 7, 1.5, -2.25, 300), (2**40, -7, -0.5, 1e100, -300)]
    buf, tables = _roundtrip(
        tmp_path, ["A", "B", "C", "D", "E"], ["K", "J", "E", "D", "I"], rows
    )
    assert len(buf) % _BLOCK == 0
    (cards, t), = tables
    assert int(cards["NAXIS1"]) == 8 + 4 + 4 + 8 + 2
    assert t["A"].tolist() == [-(2**40), 2**40]
    assert t["B"].tolist() == [7, -7]
    assert t["C"].tolist() == [1.5, -0.5]  # exact binary fractions
    assert t["D"].tolist() == [-2.25, 1e100]
    assert t["E"].tolist() == [300, -300]


def test_string_fields_space_padded_and_trimmed(tmp_path):
    _, tables = _roundtrip(
        tmp_path, ["NAME"], ["10A"], [("abc",), ("exactly10!",)]
    )
    (_, t), = tables
    assert t["NAME"].tolist() == ["abc", "exactly10!"]


def test_image_hdu_between_tables_is_skipped(tmp_path):
    """A 3-HDU file (primary, IMAGE, BINTABLE): the walk must hop the
    image payload by BITPIX*NAXIS arithmetic and still land exactly on
    the table header."""
    p1 = os.path.join(tmp_path, "a.fits")
    write_fits_bintable(p1, ["X"], ["J"], [(11,), (22,)])
    with open(p1, "rb") as fh:
        buf = fh.read()
    primary, rest = buf[:_BLOCK], buf[_BLOCK:]
    img_hdr = _pad(
        _card("XTENSION", "IMAGE") + _card("BITPIX", -32)
        + _card("NAXIS", 2) + _card("NAXIS1", 7) + _card("NAXIS2", 5)
        + _card("PCOUNT", 0) + _card("GCOUNT", 1) + _card("END")
    )
    img_data = np.arange(35, dtype=">f4").tobytes()
    img_data += b"\x00" * ((-len(img_data)) % _BLOCK)
    stitched = primary + img_hdr + img_data + rest
    tables = list(parse_fits_bintables(stitched))
    assert len(tables) == 1
    assert tables[0][1]["X"].tolist() == [11, 22]
    headers = list(parse_fits_headers(stitched))
    assert [h.get("XTENSION", "PRIMARY") for h in headers] == [
        "PRIMARY", "IMAGE", "BINTABLE"
    ]


def test_row_width_mismatch_raises(tmp_path):
    path = os.path.join(tmp_path, "bad.fits")
    write_fits_bintable(path, ["X"], ["J"], [(1,)])
    with open(path, "rb") as fh:
        buf = fh.read()
    corrupted = buf.replace(
        _card("NAXIS1", 4), _card("NAXIS1", 8)
    )
    with pytest.raises(ValueError, match="NAXIS1"):
        list(parse_fits_bintables(corrupted))


def test_missing_end_card_raises():
    with pytest.raises(ValueError, match="END"):
        list(parse_fits_headers(b" " * _BLOCK))


def test_unsupported_tform_raises(tmp_path):
    with pytest.raises(ValueError, match="TFORM"):
        write_fits_bintable(
            os.path.join(tmp_path, "x.fits"), ["X"], ["C"], [(1,)]
        )


def test_scan_fits_distributes_one_task_per_file(spark):
    """The Spark surface: 5 staged files -> the binaryFile listing
    feeds the Arrow kernel and returns all 25 nations."""
    from analyse_the_sky_with_apache_spark_spark.sources.fits import scan_fits

    df = scan_fits(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert len(rows) == 25
    assert {r["n_regionkey"] for r in rows} == set(range(5))


def test_coadd_overlap_counts_vs_numpy(spark):
    """Mosaic coadd rebuilt in pure numpy from the same tile formula:
    per-gx observation counts and centi-sums must match exactly."""
    import numpy as np

    from analyse_the_sky_with_apache_spark_spark.sources.fits import (
        _COADD_STRIDE,
        _IMG_NX,
        _IMG_NY,
        _IMG_TILES,
        sky_coadd_tiles,
    )

    sums: dict[int, int] = {}
    obs: dict[int, int] = {}
    for f in range(_IMG_TILES):
        idx = np.arange(_IMG_NX * _IMG_NY)
        k = (f * 1_000_003 + idx) * 7919 % 3600
        i = idx % _IMG_NX
        for gx in range(f * _COADD_STRIDE, f * _COADD_STRIDE + _IMG_NX):
            sel = k[i == (gx - f * _COADD_STRIDE)]
            sums[gx] = sums.get(gx, 0) + int(sel.sum())
            obs[gx] = obs.get(gx, 0) + len(sel)

    rows = sky_coadd_tiles(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == max(sums) + 1
    for r in rows:
        assert r["n_obs"] == obs[r["gx"]]
        assert r["sum_centi"] == sums[r["gx"]]
        assert r["mean_centi"] == sums[r["gx"]] // obs[r["gx"]]
    # interior columns are covered by exactly two overlapping tiles
    two_cov = [r for r in rows if r["n_obs"] == 2 * 30]
    assert len(two_cov) > 0


def test_fits_image_roundtrip_float64(tmp_path):
    """IMAGE writer/parser round-trip preserves float32 pixel values
    bit-exactly (big-endian on disk, native in memory)."""
    import os

    import numpy as np

    from analyse_the_sky_with_apache_spark_spark.sources.fits import (
        parse_fits_images,
        write_fits_image,
    )

    px = np.linspace(-1.5, 2.5, 12, dtype=np.float32).reshape(3, 4)
    path = os.path.join(tmp_path, "img.fits")
    write_fits_image(path, px)
    with open(path, "rb") as fh:
        buf = fh.read()
    (cards, back), = parse_fits_images(buf)
    assert int(cards["NAXIS1"]) == 4 and int(cards["NAXIS2"]) == 3
    assert back.dtype == np.float32
    assert np.array_equal(back, px)


def test_string_card_with_slash_keeps_slash(tmp_path):
    """ADVICE r9: a conforming string card whose VALUE contains '/'
    (e.g. TTYPE1 = 'FLUX/ERR') must parse to the closing quote, not be
    truncated at the comment separator; escaped quotes ('') unescape."""
    from analyse_the_sky_with_apache_spark_spark.sources.fits import (
        _read_header,
    )

    buf = _pad(
        _card("SIMPLE", True)
        + _card("TTYPE1", "FLUX/ERR")
        + "TTYPE2  = 'O''HARA/X' / obs name".ljust(80).encode("ascii")
        + _card("BITPIX", 8)
        + _card("END")
    )
    cards, _ = _read_header(buf, 0)
    assert cards["TTYPE1"] == "FLUX/ERR"
    assert cards["TTYPE2"] == "O'HARA/X"
    assert cards["BITPIX"] == "8"  # numeric card still drops comments


def test_writers_stage_atomically(tmp_path, monkeypatch):
    """ADVICE r9: writers must never expose a truncated file at the
    final path — build under a per-pid temp name, then os.replace."""
    import analyse_the_sky_with_apache_spark_spark.sources.fits as fits

    seen = {}
    real_replace = os.replace

    def spy(src, dst):
        seen["src"], seen["dst"] = src, dst
        assert src == f"{dst}.tmp-{os.getpid()}"
        assert os.path.getsize(src) % _BLOCK == 0  # fully built already
        real_replace(src, dst)

    monkeypatch.setattr(fits.os, "replace", spy)
    path = os.path.join(tmp_path, "t.fits")
    write_fits_bintable(path, ["K1"], ["J"], [(1,), (2,)])
    assert seen["dst"] == path and os.path.exists(path)
    assert not os.path.exists(seen["src"])

    seen.clear()
    fits.write_fits_image(
        os.path.join(tmp_path, "img.fits"),
        np.zeros((2, 2), dtype=np.float32),
    )
    assert seen["dst"].endswith("img.fits")
