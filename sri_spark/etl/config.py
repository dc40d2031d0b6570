"""Pipeline configuration.

Two semantic modes (SURVEY §7.1):

- ``parity`` — reproduce the reference's observable behavior exactly,
  including its quirks (SURVEY §1.3 Q1–Q5): run-date stamping of every fact
  row, pandas float/NaN stringification ('10701.0', 'nan', 'NAN'),
  clean-after-dedup dims, and m:m lookup fan-out.
- ``fixed`` — same star schema with the quirks repaired: real M/d/yyyy date
  parsing, canonical integer canton codes, clean-before-dedup, lookup dims
  deduplicated on their join keys (1:1 lookups, no fan-out).

``run_date`` replaces the reference's ``datetime.now().date()`` (reference
dags/sri_vehiculos_etl_dag.py:462-463) so parity outputs are deterministic.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass


@dataclass(frozen=True)
class EtlConfig:
    mode: str = "fixed"  # "parity" | "fixed"
    run_date: dt.date = dt.date(2025, 7, 2)  # the reference's recorded run day
    # guard against Q4-style fan-out explosions in parity mode: abort when the
    # worst-case lookup multiplier exceeds this (SURVEY §7.4). Parity mode is
    # a small-fixture equivalence tool: at production scale even a guarded
    # fan-out multiplies the fact by the average dim multiplicity AND funnels
    # it through the reference's positional-order global sort — use fixed
    # mode (1:1 lookups) for real workloads, as the survey prescribes
    max_fanout_factor: float = 100.0
    # force broadcast of the dimension sides of the fact lookups. Right for
    # dims up to a few hundred MB (production dim_vehiculo: 331k rows); set
    # False when a dim outgrows executor memory — joins fall back to
    # Catalyst/AQE strategy selection (sort-merge with skew splitting)
    broadcast_lookups: bool = True
    # reference semantics fill unmatched lookup FKs with 1 before loading,
    # which makes null-FK validation vacuous (the reference's own check never
    # fires). False keeps misses as nulls so quality_report's
    # max_null_percentage threshold actually gates
    fill_missing_fk: bool = True
    # assign ID_Registro with the sort-free two-phase ranking
    # (operators.keys.add_surrogate_key_scalable). Costs one extra shuffle +
    # a per-partition-count job, so it only pays off once the fact outgrows a
    # single executor's sort buffer (~10M+ rows); identical key values either
    # way (same total order)
    scalable_keys: bool = False

    def __post_init__(self) -> None:
        if self.mode not in ("parity", "fixed"):
            raise ValueError(f"mode must be 'parity' or 'fixed', got {self.mode!r}")

    @property
    def parity(self) -> bool:
        return self.mode == "parity"
