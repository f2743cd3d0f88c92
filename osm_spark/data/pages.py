"""Deterministic Common-Crawl-style pages table (BASELINE.json input_hint:
url, warc_ts, html, text, lang) — generated DISTRIBUTED.

This is the 10^12-document side of the engine, so generation is pure
column arithmetic over ``spark.range(n)`` — no driver-side rows, no RNG
state: every value is a deterministic integer-mixing function of the row
id. The exact same expressions are emitted as DuckDB SQL over
``generate_series`` so the driver's differential oracle can reproduce
the table bit-for-bit (integer micro-degree coordinates; no float
formatting anywhere).

Geography (matches osm_spark.data.worldgen): page i belongs to country
``i % n_countries``; bucket ``k = i % 20`` places it:

    k 0-5   hot city cluster: one ~0.6° box inside country 0's city
            commune (30% of ALL pages -> deliberate hot-cell skew)
    k 7     exactly on a département border line (PIP boundary case)
    k 8     in the lake hole (inside country bbox, outside polygon)
    k 18    on the island inside the lake (second polygon of the country)
    k 9,19  ocean strip outside every polygon
    else    uniform over the country rectangle

The embedded "geo: <lat_u>,<lon_u>" mention in ``text`` is what
geoparse extracts; text must survive every stage byte-identically.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class PagesSpec:
    n_pages: int = 10_000
    n_countries: int = 2


def _exprs(i: str, idiv: str, spec: PagesSpec) -> dict[str, str]:
    """Column expressions shared by Spark SQL and DuckDB SQL.

    ``idiv``: integer-division operator ("div" for Spark, "//" for
    DuckDB). All arithmetic is int64-exact in both engines.
    """
    c = f"({i} % {spec.n_countries})"
    base_lon = f"((-177 + ({c} % 16) * 10) * 1000000)"
    base_lat = f"((-84 + ({c} {idiv} 16) * 10) * 1000000)"
    h1 = f"(({i} * 2654435761) % 1000000)"
    h2 = f"(({i} * 2246822519) % 1000000)"
    k = f"({i} % 20)"
    c0_lon = "(-177 * 1000000)"
    c0_lat = "(-84 * 1000000)"
    lon_u = (
        f"(CASE WHEN {k} <= 5 THEN {c0_lon} + 200000 + ({h1} * 6) {idiv} 10 "
        f"WHEN {k} = 7 THEN {base_lon} + 4000000 "
        f"WHEN {k} = 8 THEN {base_lon} + 1050000 + ({h1} * 4) {idiv} 10 "
        f"WHEN {k} = 18 THEN {base_lon} + 1600000 + ({h1} * 3) {idiv} 10 "
        f"WHEN {k} = 9 OR {k} = 19 THEN {base_lon} + 8200000 + ({h1} * 7) {idiv} 10 "
        f"ELSE {base_lon} + ({h1} * 8) END)"
    )
    lat_u = (
        f"(CASE WHEN {k} <= 5 THEN {c0_lat} + 200000 + ({h2} * 6) {idiv} 10 "
        f"WHEN {k} = 7 THEN {base_lat} + 100000 + ({h2} * 78) {idiv} 10 "
        f"WHEN {k} = 8 THEN {base_lat} + 1050000 + ({h2} * 4) {idiv} 10 "
        f"WHEN {k} = 18 THEN {base_lat} + 1600000 + ({h2} * 3) {idiv} 10 "
        f"WHEN {k} = 9 OR {k} = 19 THEN {base_lat} + 1000000 + ({h2} * 6) {idiv} 10 "
        f"ELSE {base_lat} + ({h2} * 8) END)"
    )
    lang = (
        f"(CASE {i} % 5 WHEN 0 THEN 'en' WHEN 1 THEN 'fr' WHEN 2 THEN 'de' "
        f"WHEN 3 THEN 'es' ELSE 'it' END)"
    )
    url = f"('https://example.org/page/' || CAST({i} AS STRING))"
    text = (
        f"('Page ' || CAST({i} AS STRING) || ' from country ' || CAST({c} AS STRING)"
        f" || '. geo: ' || CAST({lat_u} AS STRING) || ',' || CAST({lon_u} AS STRING)"
        f" || ' Lorem ipsum dolor sit amet, consectetur adipiscing elit.')"
    )
    # Realistic markup around the text (the north-rule invariant is
    # "byte-identical extracted text per url", so the html column must
    # be something extraction actually has to WORK on): head block with
    # title/meta, body-level script (contains '<', '>', '&&' — the tag
    # stripper must not fire inside it), style block, comment,
    # attributed tags, and the body text numeric-entity-encoded
    # (',' -> '&#44;', '.' -> '&#46;') so entity decoding sits on the
    # byte-identity path. '&' is encoded first (standard order) even
    # though the synthetic text has none.
    enc_text = (
        f"replace(replace(replace({text},"
        f" '&', '&amp;'), ',', '&#44;'), '.', '&#46;')"
    )
    ident = f"CAST({i} AS STRING)"
    # Deterministic outlinks (page graph for link extraction/PageRank,
    # q80-q82): page i carries d = i % 4 anchors (d=0 -> dangling
    # node), targets fixed integer mixes of i. Anchor BODIES are empty
    # so the tag stripper removes them without a trace — the
    # "byte-identical extracted text per url" invariant (q70) is
    # untouched. The three href forms deliberately exercise URL
    # resolution + normalization: absolute, root-relative with a
    # tracking param + fragment, and www + explicit default port.
    d = f"({i} % 4)"
    t1 = f"CAST((({i} * 2654435761 + 97) % {spec.n_pages}) AS STRING)"
    t2 = f"CAST((({i} * 2246822519 + 40503) % {spec.n_pages}) AS STRING)"
    t3 = f"CAST((({i} * 97 + 12582917) % {spec.n_pages}) AS STRING)"
    nav_str = (
        f"('<nav>' || CASE WHEN {d} >= 1 THEN "
        f"'<a href=\"https://example.org/page/' || {t1} || '\"></a>' ELSE '' END"
        f" || CASE WHEN {d} >= 2 THEN "
        f"'<a href=\"/page/' || {t2} || '?utm_source=feed#r\"></a>' ELSE '' END"
        f" || CASE WHEN {d} >= 3 THEN "
        f"'<a href=\"https://www.example.org:443/page/' || {t3} || '\"></a>'"
        f" ELSE '' END || '</nav>')"
    )
    html_str = (
        "('<!DOCTYPE html><html lang=\"' || " + lang + " || '\"><head>"
        "<meta charset=\"utf-8\"/><title>page ' || " + ident + " || '"
        "</title></head><body class=\"doc\" data-page=\"' || " + ident + " || '\">"
        "<script type=\"text/javascript\">if (1 < 2 && n > 0) { track(\"p\"); }"
        "</script><style media=\"screen\">p { margin: 0; }</style>"
        "<!-- warc segment ' || " + ident + " || ' --><div id=\"main\"><p>' || "
        + enc_text + " || '</p>' || " + nav_str + " || '</div></body></html>')"
    )
    return {
        "url": url,
        "warc_ts_epoch": f"(1600000000 + {i})",
        "text": text,
        "lang": lang,
        "html_str": html_str,
        "lon_u": lon_u,
        "lat_u": lat_u,
        "country": c,
        "bucket": k,
    }


def pages_df(spark: SparkSession, spec: PagesSpec) -> DataFrame:
    """Distributed pages DataFrame (url, warc_ts, html, text, lang)."""
    e = _exprs("id", "div", spec)
    df = spark.range(spec.n_pages).selectExpr(
        f"{e['url']} AS url",
        f"timestamp_seconds({e['warc_ts_epoch']}) AS warc_ts",
        f"cast({e['html_str']} AS BINARY) AS html",
        f"{e['text']} AS text",
        f"{e['lang']} AS lang",
    )
    return df


def pages_duckdb_sql(spec: PagesSpec, columns: str = "url, warc_ts, text, lang") -> str:
    """DuckDB SQL producing the identical table (html omitted unless
    asked — blob comparison is format-noise)."""
    e = _exprs("i", "//", spec)
    sel = {
        "url": f"{e['url'].replace(' AS STRING', ' AS VARCHAR')} AS url",
        "warc_ts": f"CAST(to_timestamp({e['warc_ts_epoch']}) AS TIMESTAMP) AS warc_ts",
        "text": f"{e['text'].replace(' AS STRING', ' AS VARCHAR')} AS text",
        "lang": f"{e['lang']} AS lang",
        "lon_u": f"{e['lon_u']} AS lon_u",
        "lat_u": f"{e['lat_u']} AS lat_u",
        "html_str": (
            f"{e['html_str'].replace(' AS STRING', ' AS VARCHAR')} AS html_str"
        ),
    }
    cols = ", ".join(sel[c.strip()] for c in columns.split(","))
    return (
        f"SELECT {cols} FROM generate_series(0, {spec.n_pages - 1}) AS t(i)"
    )


PNG_W, PNG_H = 12, 20  # 240 px: NOT a multiple of 256, so per-page
# seeds change the pixel-sum invariant (a 256-multiple would average
# every seed to the same mean and the q52 oracle would prove nothing).


def pages_png_sql_exprs(i: str) -> dict[str, str]:
    """Closed-form SQL for the synthetic image's pixel stream — shared
    by the q52 DuckDB oracle. Pixel p (row-major, p in [0, W*H)) of
    page ``i`` is ``(seed + p) % 256`` with ``seed = (i*2654435761) %
    256``; valid in both Spark SQL and DuckDB."""
    return {
        "seed": f"(({i} * 2654435761) % 256)",
        "n_px": str(PNG_W * PNG_H),
        "width": str(PNG_W),
        "height": str(PNG_H),
    }


def pages_png_df(spark: SparkSession, spec: PagesSpec) -> DataFrame:
    """(url, payload) — one REAL tiny PNG per page (pure-python encoder,
    osm_spark/text/png.py), pixels the deterministic pattern of
    ``pages_png_sql_exprs`` so a SQL oracle can reproduce any
    pixel-derived feature. Generated DISTRIBUTED (one Arrow pass over
    spark.range); kept separate from ``pages_df`` so the geo hot path
    stays pure Catalyst."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from osm_spark.text.png import encode_png

    w, h = PNG_W, PNG_H

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ramp = np.arange(w * h, dtype=np.int64)
        for pdf in it:
            ids = pdf["id"].to_numpy(np.int64)
            payloads = []
            for i in ids:
                seed = (int(i) * 2654435761) % 256
                px = ((seed + ramp) % 256).astype(np.uint8).reshape(h, w)
                payloads.append(encode_png(px))
            yield pd.DataFrame(
                {
                    "url": "https://example.org/page/" + pd.Series(ids).astype(str),
                    "payload": payloads,
                }
            )

    return spark.range(spec.n_pages).mapInPandas(
        gen, "url string, payload binary"
    )


JPEG_W, JPEG_H = 16, 24  # multiples of 8: 2×3 = 6 JPEG blocks; each
# block is CONSTANT-valued so the lossy encode→decode round-trip has a
# CLOSED FORM the q163 oracle can replay (quantize_dc_closed_form:
# only the DC coefficient survives, and the luma DC quant step at
# quality 50 is 16 — a multiple of 8, so reconstruction is integral).


def pages_jpeg_sql_exprs(i: str, b: str) -> dict[str, str]:
    """Closed-form SQL for the synthetic JPEG's DECODED pixels —
    shared by the q163 DuckDB oracle. Block ``b`` (row-major block
    index in [0, 6)) of page ``i`` has source value ``c = (seed +
    37·b) % 256`` with ``seed = (i*2654435761) % 256``; the decoded
    value is the DC closed form at q00=16:
        dc = 8c − 1024;  k = round_half_away(dc / 16)
        v  = clamp(2k + 128, 0, 255)
    Valid in both Spark SQL and DuckDB (integer ops only)."""
    seed = f"(({i} * 2654435761) % 256)"
    c = f"(({seed} + 37 * {b}) % 256)"
    dc = f"(8 * {c} - 1024)"
    k = (
        f"(CASE WHEN {dc} >= 0 THEN ({dc} + 8) // 16 "
        f"ELSE -((-({dc}) + 8) // 16) END)"
    )
    return {
        "seed": seed,
        "c": c,
        "v": f"LEAST(255, GREATEST(0, 2 * {k} + 128))",
        "width": str(JPEG_W),
        "height": str(JPEG_H),
        "n_blocks_x": str(JPEG_W // 8),
    }


def pages_jpeg_df(spark: SparkSession, spec: PagesSpec) -> DataFrame:
    """(url, payload) — one REAL tiny baseline JPEG per page
    (pure-python encoder, osm_spark/text/jpeg.py), 8×8-block-constant
    pixels per ``pages_jpeg_sql_exprs`` so a SQL oracle can reproduce
    every DECODED pixel through the lossy round-trip's DC closed form.
    Generated DISTRIBUTED (one Arrow pass over spark.range); the
    pages_png_df shape."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from osm_spark.text.jpeg import encode_jpeg

    w, h = JPEG_W, JPEG_H
    bw, bh = w // 8, h // 8

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bidx = np.arange(bw * bh, dtype=np.int64)
        for pdf in it:
            ids = pdf["id"].to_numpy(np.int64)
            payloads = []
            for i in ids:
                seed = (int(i) * 2654435761) % 256
                blocks = ((seed + 37 * bidx) % 256).reshape(bh, bw)
                px = np.repeat(
                    np.repeat(blocks, 8, axis=0), 8, axis=1
                ).astype(np.uint8)
                payloads.append(encode_jpeg(px, quality=50))
            yield pd.DataFrame(
                {
                    "url": "https://example.org/page/" + pd.Series(ids).astype(str),
                    "payload": payloads,
                }
            )

    return spark.range(spec.n_pages).mapInPandas(
        gen, "url string, payload binary"
    )


GIF_W, GIF_H = 14, 18  # 252 px: not a 256 multiple (the q61 argument —
# per-page seeds must change the pixel-sum invariant)


def pages_gif_sql_exprs(i: str) -> dict[str, str]:
    """Closed-form SQL for the synthetic GIF's pixel stream — shared
    by the q169 DuckDB oracle. GIF is LOSSLESS, so the decoded pixels
    ARE the source formula (the q61 PNG contract): pixel p of page
    ``i`` is ``(seed + 3*p) % 256``, seed = (i*2654435761) % 256."""
    return {
        "seed": f"(({i} * 2654435761) % 256)",
        "n_px": str(GIF_W * GIF_H),
        "width": str(GIF_W),
        "height": str(GIF_H),
    }


def pages_gif_df(spark: SparkSession, spec: PagesSpec) -> DataFrame:
    """(url, payload) — one REAL tiny GIF per page (pure-python LZW
    encoder, osm_spark/text/gif.py), pixels the deterministic pattern
    of ``pages_gif_sql_exprs``. The pages_png_df shape."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from osm_spark.text.gif import encode_gif

    w, h = GIF_W, GIF_H

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ramp = np.arange(w * h, dtype=np.int64)
        for pdf in it:
            ids = pdf["id"].to_numpy(np.int64)
            payloads = []
            for i in ids:
                seed = (int(i) * 2654435761) % 256
                px = ((seed + 3 * ramp) % 256).astype(np.uint8).reshape(h, w)
                payloads.append(encode_gif(px))
            yield pd.DataFrame(
                {
                    "url": "https://example.org/page/" + pd.Series(ids).astype(str),
                    "payload": payloads,
                }
            )

    return spark.range(spec.n_pages).mapInPandas(
        gen, "url string, payload binary"
    )


WAV_N, WAV_RATE = 250, 8000  # 250 samples: NOT a multiple of 65536's
# cycle or of the 37 stride, so per-page streams genuinely differ.


def pages_wav_sql_exprs(i: str) -> dict[str, str]:
    """Closed-form SQL for the synthetic PCM stream — shared by the
    q90 DuckDB oracle. Sample p (p in [0, WAV_N)) of page ``i`` is
    ``((seed + p*37) % 65536) - 32768`` with ``seed = (i*2654435761) %
    65536``; valid in both Spark SQL and DuckDB."""
    return {
        "seed": f"(({i} * 2654435761) % 65536)",
        "n_samples": str(WAV_N),
        "rate": str(WAV_RATE),
    }


def pages_wav_df(spark: SparkSession, spec: PagesSpec) -> DataFrame:
    """(url, payload) — one REAL tiny WAV per page (pure-python
    PCM-16 encoder, osm_spark/text/wav.py), samples the deterministic
    pattern of ``pages_wav_sql_exprs`` so a SQL oracle can reproduce
    any sample-derived feature. Generated DISTRIBUTED, one Arrow pass
    over spark.range (the pages_png_df shape)."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from osm_spark.text.wav import encode_wav

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ramp = np.arange(WAV_N, dtype=np.int64)
        for pdf in it:
            ids = pdf["id"].to_numpy(np.int64)
            payloads = []
            for i in ids:
                seed = (int(i) * 2654435761) % 65536
                s = (((seed + ramp * 37) % 65536) - 32768).astype(np.int16)
                payloads.append(encode_wav(s, WAV_RATE))
            yield pd.DataFrame(
                {
                    "url": "https://example.org/page/"
                    + pd.Series(ids).astype(str),
                    "payload": payloads,
                }
            )

    return spark.range(spec.n_pages).mapInPandas(
        gen, "url string, payload binary"
    )
