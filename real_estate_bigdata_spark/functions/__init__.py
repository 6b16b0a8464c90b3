"""Column-expression function library (JVM-side, Catalyst-optimizable).

Submodules:

- ``normalize`` — the reference crawler's scalar parse cluster (F1–F14 in
  SURVEY.md §2.8) as pure Column expressions.
- ``text``      — text analysis for training-data pipelines: language ID,
  quality scoring, token counting, fingerprinting, shingling.
- ``vectors``   — embedding math (dot / cosine) over ``array`` columns.
"""

from real_estate_bigdata_spark.functions import normalize, text, vectors  # noqa: F401
