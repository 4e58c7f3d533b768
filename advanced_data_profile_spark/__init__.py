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
  Arrow-batched ``mapInPandas`` — no per-row Python anywhere;
- checkpoint/resume via a manifest table (``plans.manifest``).

Everything is DataFrame-API first so Catalyst gets predicate pushdown,
column pruning (never read ``bytes`` for stats-only passes), partial
aggregation, AQE skew handling and broadcast joins for free.
"""

__version__ = "0.1.0"
