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
    ("raw_data/c/clip.mov", "video", "clip"),
    # .webm / .gif are NOT in the reference's sets (process_raw_data.py:10-12)
    ("raw_data/c/clip.webm", None, "clip"),
    ("raw_data/b/anim.gif", None, "anim"),
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


def test_pair_dir_and_dynamic_branches(spark):
    """Directory-shape audio_text_pair inference + static/dynamic website
    split + the basename pair join (audio_text_processing.py:26-49)."""
    from runyoro_llm_data_pipeline_spark.operators.dispatch import (
        dir_pair_flags,
        pair_audio_text,
    )

    listing = spark.createDataFrame(
        [
            ("d1", "d1/sample.wav"),
            ("d1", "d1/sample.txt"),
            ("d1", "d1/other.txt"),
            ("d2", "d2/only_audio.mp3"),
            ("d3", "d3/only_text.txt"),
            ("d4", "d4/a.flac"),
            ("d4", "d4/a.txt"),
            ("d4", "d4/b.ogg"),
        ],
        "dir string, path string",
    )
    flags = {r["dir"]: r["is_pair_dir"] for r in dir_pair_flags(listing).collect()}
    assert flags == {"d1": True, "d2": False, "d3": False, "d4": True}

    pairs = {
        (r["dir"], r["base"]): (r["audio_path"], r["text_path"])
        for r in pair_audio_text(listing).collect()
    }
    assert pairs == {
        ("d1", "sample"): ("d1/sample.wav", "d1/sample.txt"),
        ("d4", "a"): ("d4/a.flac", "d4/a.txt"),
    }

    # dynamic_when routes URLs; is_pair_dir wins over everything
    df = spark.createDataFrame(
        [
            ("https://x.y/p", False, False, "website_static"),
            ("https://x.y/p?render=js", False, True, "website_dynamic"),
            ("raw_data/pairs_1", True, False, "audio_text_pair"),
        ],
        "path string, pairdir boolean, dyn boolean, want string",
    )
    got = df.select(
        "want",
        detect_source_type(
            F.col("path"), is_pair_dir=F.col("pairdir"), dynamic_when=F.col("dyn")
        ).alias("t"),
    ).collect()
    assert all(r["t"] == r["want"] for r in got)
