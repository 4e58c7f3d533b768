"""advanced_data_profile_spark — a PySpark-native profiling + constraint
validation engine.

A from-scratch re-expression of the capabilities of
stabgan/Advanced-Data-Profile (a single-process pandas CSV profiler,
reference read-only at /root/reference) as idiomatic Spark dataflow:

- one wide-aggregation pass computes all per-column statistics
  (``operators.stats``), replacing the reference's per-column Python
  loops (reference Profiler.py:576, 627, 695) with a single scan;
- type inference (``operators.typeinfer``) reproduces the reference's
  six logical types (Profiler.py:203-220) via ``try_to_timestamp``
  format voting instead of per-value strptime sweeps;
- a declarative constraint engine (``operators.constraints``) adds the
  uniqueness / referential / domain / drift checks of the north rule,
  with per-partition pass/fail verdicts and violation rows;
- image payload verification (``operators.image_verify``) runs in
  Arrow-batched ``mapInPandas``/``mapInArrow`` — no per-row Python
  anywhere; WAV audio featurize is a real pure-numpy RIFF/PCM kernel
  (``functions.audiocodec``);
- training-data ops: exact/MinHash/SimHash/winnowing/embedding dedup
  with scale-safe bucketed candidate generation and connected-component
  cluster resolution (``operators.dedup``), ANN search (brute force,
  multi-probe sign-LSH, IVF with a learned KMeans quantizer —
  ``operators.similarity``), mergeable HLL + Welford/Chan moment
  rollups (``operators.sketches``);
- checkpoint/resume via a manifest table (``plans.manifest``); gzip
  JSON + self-contained gzip HTML reports (``plans.report``,
  ``plans.html_report``); the reference's CSV→HTML flow end-to-end
  (``plans.profile_report``, ``scripts/profile_csv.py``).

Everything is DataFrame-API first so Catalyst gets predicate pushdown,
column pruning (never read ``bytes`` for stats-only passes), partial
aggregation, AQE skew handling and broadcast joins for free.
"""

__version__ = "0.2.0"
