"""CLI mirroring the reference's `zkaggregate!` stage model (sdk/src/lib.rs).

Usage:  python -m halo2_snark_aggregator_tpu.sdk.cli -c <command> -f <folder>

Commands (sdk/src/lib.rs:30-41, 83-177):
  sample_setup     target-circuit params + keys
  sample_run       create + self-verify N_PROOFS target proofs
  verify_setup     aggregation-circuit setup          [roadmap: circuit ctx]
  verify_run       outer aggregation proof            [roadmap: circuit ctx]
  verify_check     TPU aggregation verify of all stored proofs -> final pair
  verify_solidity  EVM verifier codegen               [roadmap: codegen ctx]

The built-in demo target is the SimpleMulCircuit (2 proofs, K=6), the analog
of sdk/examples/simple-example.rs.
"""

from __future__ import annotations

import argparse
import logging
import sys

from ..circuits.simple import SimpleMulCircuit
from ..utils.store import FolderStore
from . import harness


def demo_spec() -> harness.TargetCircuitSpec:
    return harness.TargetCircuitSpec(
        name="simple",
        k=SimpleMulCircuit.K,
        n_proofs=2,
        public_input_size=1,
        circuit_builder=lambda seed: SimpleMulCircuit(2 + seed, 3 + seed),
        instance_builder=lambda c: c.instances(),
    )


def main(argv=None):
    parser = argparse.ArgumentParser(prog="halo2-snark-aggregator-tpu")
    parser.add_argument("-c", "--command", required=True,
                        choices=["sample_setup", "sample_run", "verify_setup",
                                 "verify_run", "verify_check", "verify_solidity"])
    parser.add_argument("-f", "--folder", required=True)
    parser.add_argument("--cpu", action="store_true",
                        help="run verify_check on the exact host path")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(message)s")
    store = FolderStore(args.folder)
    spec = demo_spec()

    if args.command == "sample_setup":
        harness.sample_setup(spec, store)
    elif args.command == "sample_run":
        harness.sample_run(spec, store)
    elif args.command == "verify_check":
        w_x, w_g, _ = harness.verify_check([spec], store, use_tpu=not args.cpu)
        print(f"final pair:\n  w_x = {w_x}\n  w_g = {w_g}")
    elif args.command == "verify_solidity":
        # generate an EVM verifier for a stored SHA-transcript proof; the demo
        # re-proves proof 0 with the SHA flavor (the outer aggregation proof
        # uses this transcript once the aggregation circuit lands)
        from ..prover.prove import create_proof
        from ..solidity.generate import generate
        from ..solidity.render import render
        from ..transcript.host import ShaWrite
        from ..circuits.simple import SimpleMulCircuit as _C

        params = store.read_target_params(spec.name)
        vk, pk = store.read_target_vkey(spec.name)
        circuit = spec.circuit_builder(1)
        instances = spec.instance_builder(circuit)
        proof = create_proof(pk, params, [circuit], [instances], ShaWrite(), seed=0)
        gen = generate(vk, params, proof, instances)
        assert gen.pairing_ok
        store.write_solidity(render(gen, params))
        print(f"verifier.sol written ({gen.transcript_words} proof words, "
              f"{len(gen.cg.statements)} statements)")
    else:
        print(
            f"{args.command}: requires the circuit/codegen contexts "
            "(in progress — see ROADMAP in README.md)",
            file=sys.stderr,
        )
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
