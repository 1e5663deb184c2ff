"""MockProver: direct constraint checking without proving.

The halo2 `MockProver` equivalent (the reference's gadget and integration
tests all assert `MockProver::verify()` — SURVEY §4). Evaluates every gate
polynomial on every row, checks copy (equality) constraints cell-by-cell, and
checks each lookup argument by multiset inclusion over the usable rows.

Row evaluation is vectorized over numpy object arrays (python-int elements):
the aggregation circuit (circuits/aggregator.py) assigns millions of rows, so
per-row Python loops are replaced by elementwise array arithmetic. Circuits
may set `assigner.used_rows_hint` after synthesis to bound the scan: rows
beyond the hint were never assigned, remain at the zero default, and satisfy
every (selector-gated) constraint vacuously.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..ff.bn254 import R
from ..protocol.plonk import Circuit, ConstraintSystem, Expression
from .keygen import Assignment


@dataclasses.dataclass
class Failure:
    kind: str  # "gate" | "copy" | "lookup"
    detail: str


class MockProver:
    def __init__(self, circuit: Circuit, k: int, instances: list[list[int]]):
        cs = ConstraintSystem()
        config = circuit.configure(cs)
        n = 1 << k
        usable = n - (cs.blinding_factors() + 1)
        assignment = Assignment(cs, n, usable, instances)
        circuit.synthesize(config, assignment)
        self.cs = cs
        self.n = n
        self.usable = usable
        hint = getattr(assignment, "used_rows_hint", None)
        self.check_rows = min(usable, hint) if hint else usable
        self.assignment = assignment
        self._col_cache: dict = {}

    def _rows(self, kind: str, col: int, rot: int) -> np.ndarray:
        """Column values rotated by `rot`, as an object ndarray of length
        check_rows (wraparound over the full domain, matching halo2)."""
        key = (kind, col)
        base = self._col_cache.get(key)
        if base is None:
            n = self.n
            if kind == "fixed":
                vals = self.assignment.fixed[col]
            elif kind == "advice":
                vals = self.assignment.advice[col]
            else:
                v = self.assignment.instances[col]
                vals = v + [0] * (n - len(v))
            base = np.empty(n, dtype=object)
            base[:] = vals
            self._col_cache[key] = base
        if rot:
            base = np.roll(base, -rot)
        return base[: self.check_rows]

    def _expr_rows(self, e: Expression) -> np.ndarray:
        cs = self.cs
        m = self.check_rows

        def const(v):
            a = np.empty(m, dtype=object)
            a[:] = v
            return a

        return e.evaluate(
            constant=const,
            fixed=lambda q: self._rows("fixed", *cs.fixed_queries[q]),
            advice=lambda q: self._rows("advice", *cs.advice_queries[q]),
            instance=lambda q: self._rows("instance", *cs.instance_queries[q]),
            challenge=lambda i: const(1),  # challenges unsupported in mock runs
            neg=lambda a: (-a) % R,
            add=lambda a, b: (a + b) % R,
            mul=lambda a, b: a * b % R,
            scale=lambda a, s: a * s % R,
        )

    def verify(self) -> list[Failure]:
        failures: list[Failure] = []
        # gates over the scanned rows
        for name, polys in self.cs.gates:
            for gi, poly in enumerate(polys):
                rows = self._expr_rows(poly)
                bad = np.nonzero(rows)[0]
                if bad.size:
                    failures.append(Failure(
                        "gate", f"gate '{name}'[{gi}] != 0 at row {bad[0]}"))
        # copy constraints
        cell_value = self.assignment.cell_value
        for (ca, ra, cb, rb) in self.assignment.copies:
            va = cell_value(ca, ra)
            vb = cell_value(cb, rb)
            if va % R != vb % R:
                failures.append(Failure(
                    "copy", f"{ca}@{ra} = {va} != {cb}@{rb} = {vb}"))
        # lookups (multiset inclusion over the scanned rows)
        for lk in self.cs.lookups:
            in_cols = [self._expr_rows(e) for e in lk.input_expressions]
            tab_cols = [self._expr_rows(e) for e in lk.table_expressions]
            if len(in_cols) == 1:
                table = set(tab_cols[0].tolist())
                miss = [i for i, v in enumerate(in_cols[0].tolist())
                        if v not in table]
            else:
                table = set(zip(*[c.tolist() for c in tab_cols]))
                miss = [i for i, v in enumerate(zip(*[c.tolist() for c in in_cols]))
                        if v not in table]
            if miss:
                failures.append(Failure(
                    "lookup", f"lookup '{lk.name}' miss at row {miss[0]}"))
        return failures

    def assert_satisfied(self):
        failures = self.verify()
        if failures:
            raise AssertionError(
                "MockProver failures:\n" + "\n".join(f"  {f.kind}: {f.detail}" for f in failures)
            )
