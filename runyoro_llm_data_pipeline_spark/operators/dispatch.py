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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# extension sets exactly as scripts/process_raw_data.py:10-12 (no .gif /
# .webm — the reference doesn't support them)
IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".tiff", ".bmp")
AUDIO_EXTS = (".wav", ".mp3", ".m4a", ".flac", ".ogg")
VIDEO_EXTS = (".mp4", ".avi", ".mov", ".mkv")


def _ext(path: Column) -> Column:
    """Lower-cased extension incl. dot; '' when none (os.path.splitext)."""
    base = F.element_at(F.split(path, "/"), -1)
    return F.when(
        base.contains("."), F.lower(F.concat(F.lit("."), F.element_at(F.split(base, r"\."), -1)))
    ).otherwise(F.lit(""))


def _base_no_ext(path: Column) -> Column:
    """Basename without extension (os.path.splitext semantics)."""
    base = F.element_at(F.split(path, "/"), -1)
    return F.regexp_replace(base, r"\.[^.]*$", "")


def detect_source_type(
    path: Column,
    is_pair_dir: Column | None = None,
    dynamic_when: Column | None = None,
) -> Column:
    """S1: the reference's ``detect_source_type`` as one expression.

    * ``is_pair_dir`` — the directory-shape branch
      (``process_raw_data.py:15-21``): a directory holding at least one
      supported audio file AND one ``.txt`` is an ``audio_text_pair``
      source. Directory shape is filesystem knowledge, so it arrives as a
      boolean column (see ``dir_pair_flags`` for deriving it from a file
      listing); checked FIRST, as in the reference.
    * URLs → ``website_static``, or ``website_dynamic`` when the caller's
      ``dynamic_when`` predicate holds (the reference distinguishes the
      two as caller-declared types, ``orchestrator.py:106-107`` /
      ``core_components.py:45-81``; JS-rendered pages need the dynamic
      scraper).
    * known media/doc extensions → their type; unknown → null (the
      reference skips those, ``process_raw_data.py:52``).
    """
    ext = _ext(path)
    is_url = path.startswith("http://") | path.startswith("https://")
    website = (
        F.when(dynamic_when, F.lit("website_dynamic")).otherwise(
            F.lit("website_static")
        )
        if dynamic_when is not None
        else F.lit("website_static")
    )
    chain = (
        F.when(is_url, website)
        .when(ext == ".pdf", F.lit("pdf"))
        .when(ext == ".txt", F.lit("text_file"))
        .when(ext.isin(*IMAGE_EXTS), F.lit("image"))
        .when(ext.isin(*AUDIO_EXTS), F.lit("audio"))
        .when(ext.isin(*VIDEO_EXTS), F.lit("video"))
        .otherwise(F.lit(None).cast("string"))
    )
    if is_pair_dir is not None:
        chain = F.when(
            F.coalesce(is_pair_dir, F.lit(False)), F.lit("audio_text_pair")
        ).otherwise(chain)
    return chain


def dir_pair_flags(listing: DataFrame, dir_col: str = "dir", path_col: str = "path") -> DataFrame:
    """Directory-shape inference (``process_raw_data.py:15-21``) over a
    file listing (one row per file): a directory is an audio/text pair
    source iff it contains ≥1 supported audio file and ≥1 ``.txt``. One
    map-side-combined bool aggregate per directory."""
    ext = _ext(F.col(path_col))
    return listing.groupBy(dir_col).agg(
        F.max(ext.isin(*AUDIO_EXTS)).alias("has_audio"),
        F.max(ext == ".txt").alias("has_text"),
    ).select(
        dir_col, (F.col("has_audio") & F.col("has_text")).alias("is_pair_dir")
    )


def pair_audio_text(
    listing: DataFrame, dir_col: str = "dir", path_col: str = "path"
) -> DataFrame:
    """J1's original form — the audio⋈text basename pair assembly
    (``scripts/audio_text_processing.py:26-49``): within each directory,
    audio files and ``.txt`` transcripts sharing a basename are paired.
    An equi-join on (dir, base) — broadcastable when the listing of one
    side is small, plain shuffle hash join otherwise; never a cross
    product."""
    ext = _ext(F.col(path_col))
    base = _base_no_ext(F.col(path_col))
    audio = listing.filter(ext.isin(*AUDIO_EXTS)).select(
        F.col(dir_col).alias("dir"),
        base.alias("base"),
        F.col(path_col).alias("audio_path"),
    )
    text = listing.filter(ext == ".txt").select(
        F.col(dir_col).alias("dir"),
        base.alias("base"),
        F.col(path_col).alias("text_path"),
    )
    return audio.join(text, ["dir", "base"])


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
