"""PII redaction for training-data curation: emails, IPv4 addresses,
phone numbers → typed placeholder tokens, with per-class match counts.

The reference pipeline ingests scraped web text and transcripts verbatim
(``scripts/orchestrator.py:63-101``, ``scripts/static_scraper.py``); a
corpus destined for LLM training additionally needs a PII scrub pass.
This is the standard regex-redaction operator: a fixed chain of
``regexp_replace`` column expressions — pure JVM whole-stage codegen, one
narrow projection, zero shuffle, zero Python.

Design rules:

* **RE2-compatible patterns only** (no backreferences, no lookaround) so
  the DuckDB oracle executes the *identical* regex strings and the
  redacted text matches byte-for-byte.
* **Sequential semantics**: classes are counted-then-redacted in a fixed
  order (email → IPv4 → phone), each on the output of the previous step.
  This makes the result well-defined when classes could overlap (an
  email's local part may contain ``+digits`` that the phone pattern would
  otherwise eat) and keeps counts disjoint.
* Placeholders contain no digits, so a later pattern can never re-match
  inside an earlier replacement.

Scale: per-row projection inside the scan stage; at 100 TB this pipelines
with the corpus scan and adds no stage boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Shared with the DuckDB oracle verbatim — keep RE2-safe.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IPV4_RE = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
# International-format phone: leading '+', 8-15 total digits with
# space/dash/paren separators. The mandatory '+' keeps the pattern from
# swallowing ordinary integers in prose.
PHONE_RE = "\\+[0-9][0-9 ()-]{5,16}[0-9]"

EMAIL_TOKEN = "<EMAIL>"
IPV4_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails, IPv4s, and phone numbers from ``text_col``.

    Returns (doc_id, redacted, n_emails, n_ipv4, n_phones): the scrubbed
    text plus how many matches of each class were replaced. Counts are
    taken immediately before each class's own replacement step, so they
    reflect exactly what that step redacted.
    """
    t0 = F.col(text_col)
    t1 = F.regexp_replace(t0, EMAIL_RE, EMAIL_TOKEN)
    t2 = F.regexp_replace(t1, IPV4_RE, IPV4_TOKEN)
    t3 = F.regexp_replace(t2, PHONE_RE, PHONE_TOKEN)
    return docs.select(
        "doc_id",
        t3.alias("redacted"),
        F.regexp_count(t0, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(t1, F.lit(IPV4_RE)).cast("long").alias("n_ipv4"),
        F.regexp_count(t2, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
    )
