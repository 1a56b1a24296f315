"""Source-type inference & dispatch (S1/P8) + output-name projection (P10).

The reference's ingest driver infers a source's processing pipeline from
its filename/extension (``scripts/process_raw_data.py:15-33``: extension
membership in SUPPORTED_{IMAGE,AUDIO,VIDEO}_EXTS, ``.pdf``/``.txt``
specials, URL prefixes) and derives artifact names by basename mangling
(``scripts/text_processing.py:83-85``: URL → scheme-stripped,
slash-replaced; path → splitext basename). Both are pure column
expressions here — the dispatch becomes a ``when().otherwise()`` chain the
optimizer constant-folds, and downstream per-type pipelines become
filtered branches of one DataFrame instead of an imperative type-switch
(``scripts/orchestrator.py:103-180``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# extension sets from scripts/process_raw_data.py:10-12
IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".tiff", ".bmp", ".gif")
AUDIO_EXTS = (".wav", ".mp3", ".m4a", ".flac", ".ogg")
VIDEO_EXTS = (".mp4", ".avi", ".mov", ".mkv", ".webm")


def _ext(path: Column) -> Column:
    """Lower-cased extension incl. dot; '' when none (os.path.splitext)."""
    base = F.element_at(F.split(path, "/"), -1)
    return F.when(
        base.contains("."), F.lower(F.concat(F.lit("."), F.element_at(F.split(base, r"\."), -1)))
    ).otherwise(F.lit(""))


def detect_source_type(path: Column) -> Column:
    """S1: the reference's ``detect_source_type`` as one expression.
    URLs → website_static; known media/doc extensions → their type;
    unknown → null (the reference skips those, ``process_raw_data.py:52``).
    """
    ext = _ext(path)
    return (
        F.when(path.startswith("http://") | path.startswith("https://"),
               F.lit("website_static"))
        .when(ext == ".pdf", F.lit("pdf"))
        .when(ext == ".txt", F.lit("text_file"))
        .when(ext.isin(*IMAGE_EXTS), F.lit("image"))
        .when(ext.isin(*AUDIO_EXTS), F.lit("audio"))
        .when(ext.isin(*VIDEO_EXTS), F.lit("video"))
        .otherwise(F.lit(None).cast("string"))
    )


def output_name(path: Column) -> Column:
    """P10: artifact name projection (``scripts/text_processing.py:83-85``):
    URL → strip scheme, replace '/' and '.' with '_'; path → basename
    without extension."""
    is_url = path.startswith("http://") | path.startswith("https://")
    url_mangled = F.regexp_replace(
        F.regexp_replace(path, r"^https?://", ""), r"[/.]", "_"
    )
    base = F.element_at(F.split(path, "/"), -1)
    no_ext = F.regexp_replace(base, r"\.[^.]*$", "")
    return F.when(is_url, url_mangled).otherwise(no_ext)
