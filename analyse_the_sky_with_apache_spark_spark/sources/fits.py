"""FITS source — the astronomy archive format, parsed in pure Python.

FITS (Flexible Image Transport System, the sky-survey interchange format
standardized by the IAU; NASA's FITS Standard 4.0 is public) is a
sequence of HDUs (Header-Data Units). Each HDU is a header of 80-byte
ASCII "cards" padded to 2880-byte blocks, followed by a data section
also padded to 2880-byte blocks. Catalog data ships as a BINTABLE
extension: ``NAXIS1`` bytes per row x ``NAXIS2`` rows of big-endian
fields described by ``TTYPEn``/``TFORMn`` cards.

No FITS library exists in this sandbox (astropy absent), and none is
needed: headers are fixed-width ASCII and BINTABLE payloads decode with
one ``numpy.frombuffer`` big-endian structured dtype per file. The scan
is the `scan_binaryfile` + `mapInPandas` composition:

- ``binaryFile`` lists the archive (one row per file, opaque BINARY
  payload) — at 100 TB the listing distributes across executors and
  ``pathGlobFilter`` prunes inside the listing;
- an Arrow-batched ``mapInPandas`` kernel walks each file's HDUs and
  yields the BINTABLE rows — one task per file (FITS files are not
  splittable mid-HDU, so file-per-task IS the parallel unit, exactly
  like the reference archives ship them: many ~GB tiles);
- the fixture files are AUTHORED from the ``nation`` table by a
  pure-Python writer, so the DuckDB oracle reproduces every value from
  SQL alone and the whole write -> list -> parse path is hash-checked.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .scans import _SCRATCH

_BLOCK = 2880
_CARD = 80


def _card(key: str, value: str | int | bool | None = None) -> bytes:
    """One 80-byte header card in FITS fixed format."""
    if value is None:
        text = f"{key:<8}"
    elif isinstance(value, bool):
        text = f"{key:<8}= {'T' if value else 'F':>20}"
    elif isinstance(value, int):
        text = f"{key:<8}= {value:>20}"
    else:  # string: quoted, left-justified, min 8 chars inside quotes
        text = f"{key:<8}= '{value:<8}'"
    return text.ljust(_CARD).encode("ascii")


def _pad(b: bytes) -> bytes:
    """Pad to a 2880-byte block boundary (headers pad with spaces per
    the standard; data sections pad with zeros)."""
    fill = b" " if b[:6] in (b"SIMPLE", b"XTENSI") else b"\x00"
    rem = len(b) % _BLOCK
    return b if rem == 0 else b + fill * (_BLOCK - rem)


def write_fits_bintable(
    path: str,
    names: list[str],
    formats: list[str],
    rows: list[tuple],
) -> None:
    """Author a minimal standard-conforming FITS file: empty primary
    HDU + one BINTABLE extension. ``formats`` use TFORM codes:
    J=int32, K=int64, E=float32, D=float64, <n>A=fixed ASCII."""
    header = _pad(
        _card("SIMPLE", True) + _card("BITPIX", 8) + _card("NAXIS", 0)
        + _card("EXTEND", True) + _card("END")
    )
    dt = np.dtype([(n, _np_dtype(f)) for n, f in zip(names, formats)])
    cards = (
        _card("XTENSION", "BINTABLE") + _card("BITPIX", 8)
        + _card("NAXIS", 2) + _card("NAXIS1", dt.itemsize)
        + _card("NAXIS2", len(rows)) + _card("PCOUNT", 0)
        + _card("GCOUNT", 1) + _card("TFIELDS", len(names))
    )
    for i, (n, f) in enumerate(zip(names, formats), start=1):
        cards += _card(f"TTYPE{i}", n) + _card(f"TFORM{i}", f)
    cards += _card("END")
    arr = np.zeros(len(rows), dtype=dt)
    for i, row in enumerate(rows):
        for n, f, v in zip(names, formats, row):
            arr[i][n] = v.ljust(int(f[:-1])) if f.endswith("A") else v
    _atomic_write(path, header + _pad(cards) + _pad(arr.tobytes()))


def _atomic_write(path: str, payload: bytes) -> None:
    """Build-then-rename staging (the streaming/replay.py protocol): a
    crash or concurrent stager mid-write must never leave a truncated
    .fits at the final path — the os.path.exists staging guards would
    then skip regeneration forever. Each writer builds privately under
    a per-pid temp name; os.replace is atomic, last writer wins with
    identical bytes."""
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(payload)
    os.replace(tmp, path)


def _np_dtype(tform: str) -> str:
    """TFORM code -> big-endian numpy dtype string."""
    code = tform.lstrip("0123456789")
    if code == "A":
        return f"S{int(tform[:-1] or 1)}"
    try:
        return {"J": ">i4", "K": ">i8", "E": ">f4", "D": ">f8",
                "I": ">i2", "B": "u1"}[code]
    except KeyError:
        raise ValueError(f"unsupported TFORM {tform!r}") from None


def _read_header(buf: bytes, pos: int) -> tuple[dict[str, str], int]:
    """Parse cards until END; return (cards, offset of the data
    section) — END's block is consumed whole, data starts at the next
    2880 boundary."""
    cards: dict[str, str] = {}
    while pos < len(buf):
        block = buf[pos:pos + _BLOCK]
        pos += _BLOCK
        for i in range(0, _BLOCK, _CARD):
            card = block[i:i + _CARD].decode("ascii", errors="replace")
            key = card[:8].strip()
            if key == "END":
                return cards, pos
            if card[8:10] == "= ":
                val = card[10:].strip()
                if val.startswith("'"):
                    # string value: parse to the closing quote BEFORE
                    # splitting off the '/' comment — a conforming card
                    # like TTYPE1 = 'FLUX/ERR' keeps its slash ('' is
                    # an escaped quote inside the string per the std).
                    body, i = [], 1
                    while i < len(val):
                        if val[i] == "'":
                            if val[i:i + 2] == "''":
                                body.append("'")
                                i += 2
                                continue
                            break
                        body.append(val[i])
                        i += 1
                    val = "".join(body).rstrip()
                else:
                    val = val.split("/", 1)[0].strip()
                cards[key] = val
        # END not in this block: keep reading cards
    raise ValueError("FITS header without END card")


def _data_size(cards: dict[str, str]) -> int:
    """Data-section byte length of an HDU from its header cards."""
    naxis = int(cards.get("NAXIS", "0"))
    if naxis == 0:
        return 0
    size = abs(int(cards.get("BITPIX", "8"))) // 8
    for i in range(1, naxis + 1):
        size *= int(cards[f"NAXIS{i}"])
    size += int(cards.get("PCOUNT", "0"))
    return size * int(cards.get("GCOUNT", "1"))


def parse_fits_headers(buf: bytes) -> Iterator[dict[str, str]]:
    """Walk every HDU header in a FITS byte buffer WITHOUT decoding any
    payload — data sections are skipped by exact BITPIX/NAXIS/PCOUNT
    arithmetic, so cost is O(header blocks) per HDU."""
    pos = 0
    while pos < len(buf):
        cards, pos = _read_header(buf, pos)
        size = _data_size(cards)
        pos += size + (-size) % _BLOCK  # data + padding to block boundary
        yield cards


def parse_fits_bintables(buf: bytes) -> Iterator[tuple[dict, pd.DataFrame]]:
    """Walk every HDU in a FITS byte buffer; yield (header-cards,
    decoded rows) for each BINTABLE. Non-table HDUs (primary, IMAGE)
    are skipped by exact data-size arithmetic — no byte is guessed."""
    pos = 0
    while pos < len(buf):
        cards, pos = _read_header(buf, pos)
        size = _data_size(cards)
        data = buf[pos:pos + size]
        pos += size + (-size) % _BLOCK  # data padding to block boundary
        if cards.get("XTENSION", "").strip() != "BINTABLE":
            continue
        nfields = int(cards["TFIELDS"])
        names = [cards[f"TTYPE{i}"] for i in range(1, nfields + 1)]
        forms = [cards[f"TFORM{i}"] for i in range(1, nfields + 1)]
        dt = np.dtype([(n, _np_dtype(f)) for n, f in zip(names, forms)])
        if dt.itemsize != int(cards["NAXIS1"]):
            raise ValueError(
                f"TFORM row width {dt.itemsize} != NAXIS1 {cards['NAXIS1']}"
            )
        arr = np.frombuffer(data, dtype=dt, count=int(cards["NAXIS2"]))
        out = {}
        for n, f in zip(names, forms):
            col = arr[n]
            if f.endswith("A"):
                out[n] = [v.decode("ascii").rstrip() for v in col]
            else:
                # native-endian copy: Arrow rejects big-endian buffers
                out[n] = col.astype(col.dtype.newbyteorder("="))
        yield cards, pd.DataFrame(out)


def _stage_nation_fits(spark: SparkSession, sf_dir: str) -> str:
    """Author one FITS file per region from the ``nation`` table
    (25 rows total — the scan_binaryfile bounded-staging pattern)."""
    base = os.path.join(_SCRATCH, "nation_fits")
    os.makedirs(base, exist_ok=True)
    rows = sorted(
        load_table(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .collect()
    )
    by_region: dict[int, list[tuple]] = {}
    for r in rows:
        by_region.setdefault(r["n_regionkey"], []).append(
            (r["n_nationkey"], r["n_name"], r["n_regionkey"])
        )
    for rk, data in by_region.items():
        path = os.path.join(base, f"region_{rk}.fits")
        if not os.path.exists(path):
            write_fits_bintable(
                path,
                ["N_NATIONKEY", "N_NAME", "N_REGIONKEY"],
                ["J", "25A", "J"],
                data,
            )
    return base


@register(
    "scan_fits",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
""",
)
def scan_fits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FITS BINTABLE scan — stage ``nation`` as a 5-file FITS archive
    (one file per region), list it with ``binaryFile``, decode every
    BINTABLE HDU with the pure-Python parser inside an Arrow-batched
    ``mapInPandas`` kernel, and hash-check the round-trip against the
    relational source. File-per-task is the FITS parallel unit (HDUs
    are not splittable); at 100 TB the same plan reads a million-tile
    archive with the listing distributed and payload decode in
    executor-side Python at one ``numpy.frombuffer`` per file.
    """
    base = _stage_nation_fits(spark, sf_dir)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for buf in pdf["content"]:
                for _cards, table in parse_fits_bintables(bytes(buf)):
                    yield pd.DataFrame(
                        {
                            "n_nationkey": table["N_NATIONKEY"].astype("int32"),
                            "n_name": table["N_NAME"],
                            "n_regionkey": table["N_REGIONKEY"].astype("int32"),
                        }
                    )

    return (
        spark.read.format("binaryFile")
        .load(f"{base}/*.fits")
        .select("content")
        .mapInPandas(
            decode, "n_nationkey INT, n_name STRING, n_regionkey INT"
        )
    )


@register(
    "scan_fits_header",
    oracle="""
SELECT 'region_' || CAST(n_regionkey AS VARCHAR) || '.fits' AS fname,
       CAST(33 AS BIGINT) AS row_bytes,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(3 AS BIGINT) AS n_fields
FROM nation GROUP BY n_regionkey
ORDER BY fname
""",
)
def scan_fits_header(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FITS header-only scan — the archive-triage query (how many rows
    per tile, which columns) that must NOT decode payloads: the kernel
    walks headers and skips data sections by exact BITPIX/NAXIS/PCOUNT
    arithmetic, so cost is O(header blocks) per file regardless of
    payload size. The oracle recomputes every header field (row width
    4+25+4, per-region row counts, field count) from the relational
    source — catching both writer and parser drift.
    """
    base = _stage_nation_fits(spark, sf_dir)

    def headers(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, buf in zip(pdf["path"], pdf["content"]):
                for cards in parse_fits_headers(bytes(buf)):
                    if cards.get("XTENSION", "") != "BINTABLE":
                        continue
                    yield pd.DataFrame(
                        {
                            "fname": [path.rsplit("/", 1)[-1]],
                            "row_bytes": [int(cards["NAXIS1"])],
                            "n_rows": [int(cards["NAXIS2"])],
                            "n_fields": [int(cards["TFIELDS"])],
                        }
                    )

    return (
        spark.read.format("binaryFile")
        .load(f"{base}/*.fits")
        .select("path", "content")
        .mapInPandas(
            headers,
            "fname STRING, row_bytes LONG, n_rows LONG, n_fields LONG",
        )
        .orderBy("fname")
    )


def write_fits_image(path: str, pixels: np.ndarray) -> None:
    """Author a single-HDU FITS image: 2-D float32 pixels in the
    PRIMARY HDU (BITPIX=-32, big-endian), the survey-tile shape."""
    ny, nx = pixels.shape
    header = _pad(
        _card("SIMPLE", True) + _card("BITPIX", -32) + _card("NAXIS", 2)
        + _card("NAXIS1", nx) + _card("NAXIS2", ny) + _card("END")
    )
    _atomic_write(path, header + _pad(pixels.astype(">f4").tobytes()))


_BITPIX_DTYPES = {8: "u1", 16: ">i2", 32: ">i4", 64: ">i8",
                  -32: ">f4", -64: ">f8"}


def parse_fits_images(buf: bytes) -> Iterator[tuple[dict, np.ndarray]]:
    """Walk every HDU; yield (cards, 2-D pixel array) for each image
    HDU (primary or IMAGE extension with NAXIS=2)."""
    pos = 0
    while pos < len(buf):
        cards, pos = _read_header(buf, pos)
        size = _data_size(cards)
        data = buf[pos:pos + size]
        pos += size + (-size) % _BLOCK
        xt = cards.get("XTENSION", "").strip()
        if int(cards.get("NAXIS", "0")) != 2 or xt not in ("", "IMAGE"):
            continue
        nx, ny = int(cards["NAXIS1"]), int(cards["NAXIS2"])
        dt = _BITPIX_DTYPES[int(cards["BITPIX"])]
        arr = np.frombuffer(data, dtype=dt, count=nx * ny)
        yield cards, arr.astype(arr.dtype.newbyteorder("=")).reshape(ny, nx)


#: scan_fits_image: tile geometry and the pixel formula — pixel (i, j)
#: of tile f holds ((f*1000003 + j*NX + i) * 7919 % 3600) / 100.0,
#: exactly representable to recover the centi-integer from float32.
_IMG_NX, _IMG_NY, _IMG_TILES = 40, 30, 5


@register(
    "scan_fits_image",
    oracle=f"""
WITH px AS (
  SELECT f.f, ((f.f * 1000003 + t.i) * 7919) % 3600 AS k
  FROM range(0, {_IMG_TILES}) f(f)
  CROSS JOIN range(0, {_IMG_NX * _IMG_NY}) t(i)
)
SELECT 'tile_' || CAST(f AS VARCHAR) || '.fits' AS fname,
       CAST(COUNT(*) AS BIGINT) AS n_pix,
       CAST(SUM(k) AS BIGINT) AS sum_centi,
       CAST(MIN(k) AS BIGINT) AS min_centi,
       CAST(MAX(k) AS BIGINT) AS max_centi
FROM px GROUP BY f ORDER BY fname
""",
)
def scan_fits_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FITS IMAGE scan — the pixel-data side of the archive (sky
    tiles), complementing `scan_fits`'s catalog BINTABLEs: five staged
    float32 tiles decode inside an Arrow-batched ``mapInPandas``
    kernel (one big-endian ``numpy.frombuffer`` + reshape per file)
    into per-tile pixel statistics. Pixels are authored from integer
    arithmetic on a centi-grid, so each float32 pixel recovers its
    exact integer (f32 eps ~1e-4 at this range, far under the 5e-3
    recovery threshold) and the DuckDB oracle reproduces every
    statistic from ``range()`` alone — write, byte order, HDU walk and
    decode all hash-checked with zero image library.

    100-TB posture: tile-per-task (images are one HDU, not
    splittable); per-tile reductions happen INSIDE the kernel so only
    one stats row per tile reaches the engine — a million-tile survey
    shuffles a million rows, not pixels.
    """
    base = os.path.join(_SCRATCH, "sky_tiles_fits")
    os.makedirs(base, exist_ok=True)
    for f in range(_IMG_TILES):
        path = os.path.join(base, f"tile_{f}.fits")
        if not os.path.exists(path):
            idx = np.arange(_IMG_NX * _IMG_NY, dtype=np.int64)
            k = (f * 1_000_003 + idx) * 7919 % 3600
            write_fits_image(
                path,
                (k / 100.0).astype(np.float32).reshape(_IMG_NY, _IMG_NX),
            )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, buf in zip(pdf["path"], pdf["content"]):
                for _cards, px in parse_fits_images(bytes(buf)):
                    centi = np.floor(
                        px.astype(np.float64) * 100.0 + 0.5
                    ).astype(np.int64)
                    yield pd.DataFrame(
                        {
                            "fname": [path.rsplit("/", 1)[-1]],
                            "n_pix": [int(centi.size)],
                            "sum_centi": [int(centi.sum())],
                            "min_centi": [int(centi.min())],
                            "max_centi": [int(centi.max())],
                        }
                    )

    return (
        spark.read.format("binaryFile")
        .load(f"{base}/*.fits")
        .select("path", "content")
        .mapInPandas(
            stats,
            "fname STRING, n_pix LONG, sum_centi LONG, "
            "min_centi LONG, max_centi LONG",
        )
        .orderBy("fname")
    )


#: sky_coadd_tiles: tile stride in global-x pixels (40-wide tiles every
#: 20 px -> 50% overlap with each neighbor, the mosaic shape).
_COADD_STRIDE = 20


@register(
    "sky_coadd_tiles",
    oracle=f"""
WITH px AS (
  SELECT f.f,
         t.i % {_IMG_NX} AS i,
         t.i // {_IMG_NX} AS j,
         ((f.f * 1000003 + t.i) * 7919) % 3600 AS k
  FROM range(0, {_IMG_TILES}) f(f)
  CROSS JOIN range(0, {_IMG_NX * _IMG_NY}) t(i)
),
cells AS (
  SELECT f * {_COADD_STRIDE} + i AS gx, j AS gy, k FROM px
),
coadd AS (
  SELECT gx, gy, CAST(COUNT(*) AS BIGINT) AS n_obs,
         CAST(SUM(k) AS BIGINT) AS sum_centi
  FROM cells GROUP BY gx, gy
)
SELECT CAST(gx AS BIGINT) AS gx,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(n_obs) AS BIGINT) AS n_obs,
       CAST(SUM(sum_centi) AS BIGINT) AS sum_centi,
       CAST(SUM(sum_centi) AS BIGINT) // CAST(SUM(n_obs) AS BIGINT)
         AS mean_centi
FROM coadd GROUP BY gx ORDER BY gx
""",
)
def sky_coadd_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mosaic COADD over overlapping FITS tiles — the survey-stacking
    step after `scan_fits_image`: five 40-px-wide tiles placed every
    20 px (_COADD_STRIDE) overlap 50% with each neighbor; every decoded
    pixel maps to its GLOBAL sky cell (gx = tile_origin + i, gy = j)
    and overlapping observations aggregate per cell (count + exact
    centi-integer sum -> integer-div mean). Wrong tile placement, a
    double-counted overlap, or a byte-order slip changes some cell's
    observation count or sum and fails the hash against the oracle's
    pure-arithmetic rebuild.

    100-TB posture: the kernel emits (cell, value) pairs that hash-
    partition by cell — overlap resolution is ONE map-side-combinable
    aggregate, never an image-space gather; a million-tile survey
    coadds with shuffle volume = pixels written once, and the per-gx
    rollup keeps the demo output bounded.
    """
    base = os.path.join(_SCRATCH, "sky_tiles_fits")
    os.makedirs(base, exist_ok=True)
    for f in range(_IMG_TILES):
        path = os.path.join(base, f"tile_{f}.fits")
        if not os.path.exists(path):
            idx = np.arange(_IMG_NX * _IMG_NY, dtype=np.int64)
            k = (f * 1_000_003 + idx) * 7919 % 3600
            write_fits_image(
                path,
                (k / 100.0).astype(np.float32).reshape(_IMG_NY, _IMG_NX),
            )

    def cells(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, buf in zip(pdf["path"], pdf["content"]):
                f = int(path.rsplit("tile_", 1)[-1].split(".")[0])
                for _cards, px in parse_fits_images(bytes(buf)):
                    ny, nx = px.shape
                    centi = np.floor(
                        px.astype(np.float64) * 100.0 + 0.5
                    ).astype(np.int64)
                    jj, ii = np.divmod(np.arange(nx * ny), nx)
                    yield pd.DataFrame(
                        {
                            "gx": f * _COADD_STRIDE + ii,
                            "gy": jj,
                            "k": centi.reshape(-1),
                        }
                    )

    decoded = (
        spark.read.format("binaryFile")
        .load(f"{base}/*.fits")
        .select("path", "content")
        .mapInPandas(cells, "gx LONG, gy LONG, k LONG")
    )
    coadd = decoded.groupBy("gx", "gy").agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum("k").cast("long").alias("sum_centi"),
    )
    return (
        coadd.groupBy("gx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sum("n_obs").cast("long").alias("n_obs"),
            F.sum("sum_centi").cast("long").alias("sum_centi"),
            F.expr(
                "CAST(CAST(sum(sum_centi) AS BIGINT) div "
                "CAST(sum(n_obs) AS BIGINT) AS BIGINT)"
            ).alias("mean_centi"),
        )
        .orderBy("gx")
    )
