"""CLI mirroring the reference's `zkaggregate!` stage model (sdk/src/lib.rs).

Usage:  python -m halo2_snark_aggregator_tpu.sdk.cli -c <command> -f <folder>

Commands (sdk/src/lib.rs:30-41, 83-177):
  sample_setup     target-circuit params + keys
  sample_run       create + self-verify N_PROOFS target proofs
  verify_setup     aggregation-circuit keygen (accel SRS + keygen at --agg-k)
  verify_run       outer aggregation proof (TPU-accelerated prover, SHA256)
  verify_check     TPU aggregation verify -> final pair; natively verifies the
                   stored outer proof when present
  verify_solidity  EVM verifier codegen
  verify2_run      second recursion layer: aggregate the (Poseidon) layer-1
                   outer proof into a layer-2 proof under <folder>/l2
  verify2_check    natively verify the layer-2 outer proof

The built-in demo target is the SimpleMulCircuit (2 proofs, K=6), the analog
of sdk/examples/simple-example.rs.
"""

from __future__ import annotations

import argparse
import logging
import os
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


def demo_specs(demo: str) -> list[harness.TargetCircuitSpec]:
    """`simple` mirrors simple-example.rs (one circuit family, 2 proofs);
    `multi` mirrors multi-circuit.rs (two families x 2 proofs, aggregated in
    one outer statement — sdk/examples/multi-circuit.rs:322-401)."""
    specs = [demo_spec()]
    if demo == "multi":
        from ..circuits.lookup import SimpleLookupCircuit

        specs.append(harness.TargetCircuitSpec(
            name="lookup",
            k=SimpleLookupCircuit.K,
            n_proofs=2,
            public_input_size=0,
            circuit_builder=lambda seed: SimpleLookupCircuit(
                [1, 3, 5, 7, 11, 13, (seed * 2 + 1) % 16]),
            instance_builder=lambda c: c.instances(),
        ))
    return specs


def main(argv=None):
    parser = argparse.ArgumentParser(prog="halo2-snark-aggregator-tpu")
    parser.add_argument("-c", "--command", required=True,
                        choices=["sample_setup", "sample_run", "verify_setup",
                                 "verify_run", "verify_check", "verify_solidity",
                                 "verify2_run", "verify2_check"])
    parser.add_argument("-f", "--folder", required=True)
    parser.add_argument("--cpu", action="store_true",
                        help="run verify_check on the exact host path")
    parser.add_argument("--agg-k", type=int, default=22,
                        help="aggregation-circuit size (reference k=22, "
                             "simple-example.rs:361-363)")
    parser.add_argument("--algo", choices=["sha256", "keccak256"],
                        default="sha256",
                        help="verify_solidity transcript hash: sha256 "
                             "precompile or the native keccak256 opcode "
                             "(reference codegen.rs:19-37)")
    parser.add_argument("--transcript", choices=["sha", "poseidon"],
                        default="sha",
                        help="outer-proof transcript flavor (poseidon feeds "
                             "a second recursion layer)")
    parser.add_argument("--demo", choices=["simple", "multi"], default="simple",
                        help="target-circuit set: simple-example.rs or "
                             "multi-circuit.rs analog")
    parser.add_argument("--vk-digest", choices=["native", "halo2-pinned"],
                        default=None,
                        help="pinned-vk transcript digest style: our "
                             "canonical serialization (default) or the "
                             "reconstructed halo2 {:?} pinned format "
                             "(verify.rs:56-72 interop; protocol/"
                             "pinned_compat.py)")
    args = parser.parse_args(argv)
    if args.vk_digest:
        os.environ["H2T_VK_DIGEST"] = args.vk_digest

    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(message)s")
    store = FolderStore(args.folder)
    specs = demo_specs(args.demo)
    spec = specs[0]

    if args.command == "sample_setup":
        for s in specs:
            harness.sample_setup(s, store)
    elif args.command == "sample_run":
        for s in specs:
            harness.sample_run(s, store)
    elif args.command == "verify_setup":
        harness.verify_setup(specs, store, agg_k=args.agg_k)
        print(f"aggregator vkey at k={args.agg_k} stored")
    elif args.command == "verify_run":
        proof, instances = harness.verify_run(specs, store, agg_k=args.agg_k,
                                              transcript=args.transcript)
        print(f"outer proof written ({len(proof)} bytes, "
              f"{len(instances[0])} public inputs)")
    elif args.command == "verify_check":
        w_x, w_g, _ = harness.verify_check(specs, store, use_tpu=not args.cpu)
        print(f"final pair:\n  w_x = {w_x}\n  w_g = {w_g}")
        if store.exists("verify_circuit_proof.data"):
            harness.verify_check_outer(store, agg_k=args.agg_k)
            print("outer proof natively verified (SHA256 transcript)")
    elif args.command == "verify2_run":
        # second recursion layer: re-prove the folder's Poseidon-transcript
        # layer-1 outer proof inside another aggregation circuit (the
        # reference's "Multi-layer aggregator" future work); layer-2
        # artifacts land under <folder>/l2
        import os as _os

        l2 = FolderStore(_os.path.join(args.folder, "l2"))
        proof, instances = harness.verify2_run(
            store, l2, l1_k=args.agg_k, l2_k=args.agg_k)
        print(f"layer-2 outer proof written ({len(proof)} bytes, "
              f"{len(instances[0])} public inputs)")
    elif args.command == "verify2_check":
        import os as _os

        l2 = FolderStore(_os.path.join(args.folder, "l2"))
        harness.verify2_check(l2, l2_k=args.agg_k)
        print("layer-2 outer proof natively verified")
    elif args.command == "verify_solidity":
        # generate the EVM verifier (reference SolidityGenerate::call,
        # sdk/src/lib.rs): for the OUTER aggregation proof when verify_run
        # has stored one (the production flow — the contract then verifies
        # the whole aggregated statement on-chain), else for a freshly
        # SHA-proved demo target proof
        from ..solidity.generate import generate
        from ..solidity.packed import encode as encode_packed
        from ..solidity.render import render, render_packed
        from ..solidity.syntax import check_solidity

        final_pair = None
        target_params = None
        if store.exists("verify_circuit_proof.data"):
            from ..prover.srs import setup_cached_accel

            vk = store.read_verify_vkey()
            proof = store.read_verify_proof()
            instances = store.read_verify_instance()
            params = setup_cached_accel(args.agg_k)
            # the inner final pair is pairing-checked on-chain against the
            # TARGET circuits' G2 points (verifier.sol:388-397)
            target_params = store.read_target_params(spec.name)
            final_pair = store.read_final_pair()
            if args.algo != "sha256":
                raise SystemExit("stored outer proofs use the sha256 "
                                 "transcript (harness.verify_run)")
            gen = generate(vk, params, proof, instances, algo=args.algo)
            print(f"generating verifier for the stored outer proof "
                  f"({len(proof)} bytes, k={args.agg_k})")
        else:
            from ..prover.prove import create_proof
            from ..transcript.host import ShaWrite

            params = store.read_target_params(spec.name)
            vk, pk = store.read_target_vkey(spec.name)
            circuit = spec.circuit_builder(1)
            instances = spec.instance_builder(circuit)
            proof = create_proof(pk, params, [circuit], [instances],
                                 ShaWrite(args.algo), seed=0)
            gen = generate(vk, params, proof, instances, algo=args.algo)
        assert gen.pairing_ok
        from ..solidity.lint import lint_source

        src = render(gen, params, target_params=target_params)
        check_solidity(src)
        lint_source(src)
        store.write_solidity(src)
        src_packed = render_packed(gen, params, target_params=target_params)
        check_solidity(src_packed)
        store.write_solidity(src_packed, "verifier_packed.sol")
        prog = encode_packed(gen)
        lint_source(src_packed, has_body=False,
                    packed_blob_bytes=len(prog.ops) + 32 * len(prog.cpool))
        # execute BOTH emitted sources (not just the IR) against the real
        # proof — the no-solc analog of the reference's waffle deploy+call
        # (Verifier.test.ts:39-71)
        from ..ff import bn254 as _ff
        from ..solidity.interpreter import proof_to_words
        from ..solidity.sol_exec import SolidityExecutor

        words = proof_to_words(proof)
        insts_flat = [v % _ff.R for col in instances for v in col]
        fp_note = ""
        for name, text in (("verifier.sol", src),
                           ("verifier_packed.sol", src_packed)):
            ex = SolidityExecutor(text, gen.algo)
            if not ex.verify(words, insts_flat):
                raise RuntimeError(f"{name} source-level execution REJECTED "
                                   f"the proof it was generated from")
            if final_pair is not None:
                # the aggregator entry: pass the TARGET circuits' raw final
                # pair; the contract packs it into the leading 136-bit
                # instance words itself (verifier.sol:356-365)
                w_x, w_g = final_pair
                fp = [w_x[0], w_x[1], w_g[0], w_g[1]]
                if not ex.call("verify_final_pair",
                               [words, fp, insts_flat[4:]]):
                    raise RuntimeError(
                        f"{name} verify_final_pair REJECTED the stored "
                        f"target final pair")
                fp_note = " (+ on-chain final-pair packing checked)"
        print(f"verifier.sol written ({gen.transcript_words} proof words, "
              f"{len(gen.cg.statements)} statements); verifier_packed.sol "
              f"written ({len(prog.ops)}B opcode blob + "
              f"{32 * len(prog.cpool)}B constant pool, memory_size "
              f"{prog.memory_size}); both sources executed and verified "
              f"the proof{fp_note}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
