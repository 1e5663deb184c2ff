"""MockProver: direct constraint checking without proving.

The halo2 `MockProver` equivalent (the reference's gadget and integration
tests all assert `MockProver::verify()` — SURVEY §4). Evaluates every gate
polynomial on every row, checks copy (equality) constraints cell-by-cell, and
checks each lookup argument by multiset inclusion over the usable rows.
"""

from __future__ import annotations

import dataclasses

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
        self.assignment = assignment

    def _rows(self, kind: str, col: int, rot: int) -> list[int]:
        n = self.n
        if kind == "fixed":
            base = self.assignment.fixed[col]
        elif kind == "advice":
            base = self.assignment.advice[col]
        else:
            vals = self.assignment.instances[col]
            base = [vals[i] if i < len(vals) else 0 for i in range(n)]
        return [base[(i + rot) % n] for i in range(n)]

    def _expr_rows(self, e: Expression) -> list[int]:
        cs = self.cs
        n = self.n
        return e.evaluate(
            constant=lambda v: [v] * n,
            fixed=lambda q: self._rows("fixed", *cs.fixed_queries[q]),
            advice=lambda q: self._rows("advice", *cs.advice_queries[q]),
            instance=lambda q: self._rows("instance", *cs.instance_queries[q]),
            challenge=lambda i: [1] * n,  # challenges unsupported in mock runs
            neg=lambda a: [(-x) % R for x in a],
            add=lambda a, b: [(x + y) % R for x, y in zip(a, b)],
            mul=lambda a, b: [x * y % R for x, y in zip(a, b)],
            scale=lambda a, s: [x * s % R for x in a],
        )

    def verify(self) -> list[Failure]:
        failures: list[Failure] = []
        # gates over usable rows
        for name, polys in self.cs.gates:
            for gi, poly in enumerate(polys):
                rows = self._expr_rows(poly)
                for r in range(self.usable):
                    if rows[r] % R != 0:
                        failures.append(Failure(
                            "gate", f"gate '{name}'[{gi}] != 0 at row {r}"))
                        break
        # copy constraints
        for (ca, ra, cb, rb) in self.assignment.copies:
            va = self.assignment.cell_value(ca, ra)
            vb = self.assignment.cell_value(cb, rb)
            if va % R != vb % R:
                failures.append(Failure(
                    "copy", f"{ca}@{ra} = {va} != {cb}@{rb} = {vb}"))
        # lookups (multiset inclusion over usable rows)
        for lk in self.cs.lookups:
            inputs = list(zip(*[self._expr_rows(e) for e in lk.input_expressions]))
            table = set(zip(*[self._expr_rows(e) for e in lk.table_expressions]))
            for r in range(self.usable):
                if inputs[r] not in table:
                    failures.append(Failure(
                        "lookup", f"lookup '{lk.name}' miss at row {r}: {inputs[r]}"))
                    break
        return failures

    def assert_satisfied(self):
        failures = self.verify()
        if failures:
            raise AssertionError(
                "MockProver failures:\n" + "\n".join(f"  {f.kind}: {f.detail}" for f in failures)
            )
