"""S1/P8/P10 dispatch expressions vs the reference's Python semantics
(``/root/reference/scripts/process_raw_data.py:15-33``,
``scripts/text_processing.py:83-85``)."""

from pyspark.sql import functions as F

from runyoro_llm_data_pipeline_spark.operators.dispatch import (
    detect_source_type,
    output_name,
)

CASES = [
    # (path, expected_type, expected_out_name)
    ("raw_data/a/report.pdf", "pdf", "report"),
    ("raw_data/a/notes.txt", "text_file", "notes"),
    ("raw_data/b/IMG.JPG", "image", "IMG"),
    ("raw_data/b/song.mp3", "audio", "song"),
    ("raw_data/c/clip.webm", "video", "clip"),
    ("raw_data/c/archive.zip", None, "archive"),
    ("raw_data/noext", None, "noext"),
    ("raw_data/d/many.dots.in.name.wav", "audio", "many.dots.in.name"),
    ("https://ex.am/p.le/page.html", "website_static", "ex_am_p_le_page_html"),
    ("http://ex.am/", "website_static", "ex_am_"),
]


def test_dispatch_and_naming(spark):
    df = spark.createDataFrame(
        [(i, p) for i, (p, _, _) in enumerate(CASES)], "i int, path string"
    )
    got = {
        r["i"]: (r["t"], r["n"])
        for r in df.select(
            "i",
            detect_source_type(F.col("path")).alias("t"),
            output_name(F.col("path")).alias("n"),
        ).collect()
    }
    for i, (path, want_t, want_n) in enumerate(CASES):
        assert got[i] == (want_t, want_n), (path, got[i], (want_t, want_n))
