"""Benchmark: aggregated halo2 proof verification throughput on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the end-to-end aggregation verify rate (proofs/s) of the hybrid TPU
path (host protocol replay + device Pippenger MSM), the headline metric from
BASELINE.md (north star: >=128 proofs/s on a v5p-8, i.e. 32 proofs/s/chip;
vs_baseline is measured against the per-chip target).

Also times the raw MSM kernel; set BENCH_MSM=1 to report MSM points/s instead.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _configure_jax():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def bench_msm():
    """Raw Pippenger MSM throughput (BASELINE.md axis 2: points/s at
    2^16-2^22). Times the full production path end-to-end — host bucket
    plan + device bucket phases + host materialization — using the
    size-appropriate pipeline: the log-depth segmented-scan path for
    verifier-size N, the bounded staged accumulate for commit-size N
    (a single minutes-long XLA program gets the axon worker killed)."""
    _configure_jax()

    import numpy as np

    from halo2_snark_aggregator_tpu.ops import msm as msm_mod
    from __graft_entry__ import _example_msm_inputs

    n = int(os.environ.get("BENCH_MSM_SIZE", "65536"))
    c = int(os.environ.get("BENCH_MSM_C", "8"))
    jpts, jscal = _example_msm_inputs(n)
    scal_np = np.asarray(jscal)

    # the log-depth segmented-scan path gathers a (W, N) point working set
    # (~24G HBM at 2^16 on v5e — OOM); it is the latency winner only at
    # verifier-size N. Commit-size N uses the load-balanced split plan
    # (bounded accumulate depth for any scalar distribution).
    if n <= (1 << 13):
        def run():
            return msm_mod.msm_fast(jpts, scal_np, c=c)  # host-finished
    else:
        # adaptive split target by default: forcing target=128 at 2^20+
        # multiplies the plan's row count ~40x and blew past HBM in the
        # round-2 runs (rc=143); the adaptive default keeps rows*buckets
        # bounded at every size
        env_target = os.environ.get("BENCH_MSM_TARGET")
        target = int(env_target) if env_target else None

        def run():
            return msm_mod.msm_staged_split(jpts, scal_np, c=c, target=target)

    run()  # compile
    t0 = time.time()
    reps = int(os.environ.get("BENCH_REPS", "3"))
    for _ in range(reps):
        run()
    dt = (time.time() - t0) / reps
    pts_per_s = n / dt
    return {
        "metric": "bn254_msm_points_per_sec",
        "value": round(pts_per_s, 1),
        "unit": f"points/s (2^{n.bit_length()-1} MSM, c={c}, 1 chip)",
        "vs_baseline": round(pts_per_s / 1.0e6, 4),  # vs 1M pts/s working target
    }


def bench_multihost():
    """Sharded-MSM throughput over a (host, chip) mesh. On a real pod
    deployment set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID per process; the outer mesh axis then rides DCN (one
    point per host per MSM crosses it — parallel/multihost.py). On a
    single host it degenerates to a virtual grid over the local devices,
    which still measures the two-level reduction overhead. Opt-in via
    BENCH_MULTIHOST=1."""
    import jax

    _configure_jax()
    import numpy as np

    from halo2_snark_aggregator_tpu.parallel import multihost as mh

    mh.init_distributed()
    n = int(os.environ.get("BENCH_MSM_SIZE", "65536"))
    mesh = mh.make_host_mesh()
    nh, nc = mesh.shape[mh.HOST_AXIS], mesh.shape[mh.CHIP_AXIS]
    from __graft_entry__ import _example_msm_inputs

    jpts, jscal = _example_msm_inputs(n)
    scal_np = np.asarray(jscal)

    def run():
        out = mh.msm_hier(jpts, scal_np, mesh, c=8)
        return [np.asarray(comp.limbs) for comp in out]

    run()  # compile
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        run()
    dt = (time.time() - t0) / reps
    pts_per_s = n / dt
    return {
        "metric": "bn254_msm_points_per_sec_multihost",
        "value": round(pts_per_s, 1),
        "unit": f"points/s (2^{n.bit_length()-1} MSM, {nh}x{nc} host-chip mesh)",
        "vs_baseline": round(pts_per_s / 1.0e6, 4),
    }


def bench_aggregation(use_tpu: bool = True):
    if use_tpu:
        _configure_jax()
    from halo2_snark_aggregator_tpu.arith.tpu_value import make_tpu_chips
    from halo2_snark_aggregator_tpu.circuits.simple import SimpleMulCircuit
    from halo2_snark_aggregator_tpu.protocol import verify as pv
    from halo2_snark_aggregator_tpu.protocol.transcript import PoseidonTranscriptRead
    from halo2_snark_aggregator_tpu.prover.keygen import keygen
    from halo2_snark_aggregator_tpu.prover.kzg import ParamsKZG
    from halo2_snark_aggregator_tpu.prover.prove import create_proof
    from halo2_snark_aggregator_tpu.transcript.host import PoseidonWrite

    nproofs = int(os.environ.get("BENCH_NPROOFS", "32"))  # measured sweet spot
    k = SimpleMulCircuit.K
    params = ParamsKZG.setup_cached(k)
    circuit = SimpleMulCircuit(2, 3)
    vk, pk = keygen(circuit, k, params)

    proofs = []
    for i in range(nproofs):
        c = SimpleMulCircuit(2 + i, 3 + i)
        proofs.append(
            (create_proof(pk, params, [c], [c.instances()], PoseidonWrite(), seed=i),
             c.instances())
        )

    from halo2_snark_aggregator_tpu.arith.value import ValueContext, ValueEccChip

    def run_once():
        if use_tpu:
            ctx, nchip, schip, pchip = make_tpu_chips()
        else:
            ctx = ValueContext()
            pchip = ValueEccChip()
            nchip = schip = pchip.scalar_chip
        pdata = []
        for proof_bytes, insts in proofs:
            t = PoseidonTranscriptRead(proof_bytes, ctx, nchip)
            pdata.append(pv.ProofData(instances=[insts], transcript=t, key=f"p{len(pdata)}"))
        agg_t = PoseidonTranscriptRead(b"", ctx, nchip)
        cp = pv.CircuitProof(name="bench", vk=vk, params=params, proofs=pdata)
        *_, ok = pv.verify_aggregation_proofs_in_chip(
            ctx, nchip, schip, pchip, [cp], agg_t
        )
        assert ok
        return ok

    run_once()  # warm (jit compile of the MSM kernel)
    t0 = time.time()
    reps = int(os.environ.get("BENCH_REPS", "2"))
    for _ in range(reps):
        run_once()
    dt = (time.time() - t0) / reps
    proofs_per_s = nproofs / dt
    return {
        "metric": "aggregated_proofs_verified_per_sec",
        "value": round(proofs_per_s, 3),
        "unit": f"proofs/s (batch {nproofs}, 1 chip, incl. pairing)",
        "vs_baseline": round(proofs_per_s / 32.0, 4),  # 128/s on 4-chip v5p-8
    }


def bench_batched():
    """Fully-traced batched verifier (tape phase A + flattened MSM phase B)."""
    _configure_jax()
    from halo2_snark_aggregator_tpu.circuits.simple import SimpleMulCircuit
    from halo2_snark_aggregator_tpu.protocol.batched import BatchedVerifier
    from halo2_snark_aggregator_tpu.prover.keygen import keygen
    from halo2_snark_aggregator_tpu.prover.kzg import ParamsKZG
    from halo2_snark_aggregator_tpu.prover.prove import create_proof
    from halo2_snark_aggregator_tpu.transcript.host import PoseidonWrite

    nproofs = int(os.environ.get("BENCH_NPROOFS", "8"))
    k = SimpleMulCircuit.K
    params = ParamsKZG.setup_cached(k)
    circuit = SimpleMulCircuit(2, 3)
    vk, pk = keygen(circuit, k, params)
    proofs, insts = [], []
    for i in range(nproofs):
        c = SimpleMulCircuit(2 + i, 3 + i)
        proofs.append(create_proof(pk, params, [c], [c.instances()],
                                   PoseidonWrite(), seed=i))
        insts.append(c.instances())

    bv = BatchedVerifier(vk, params, batch=nproofs, sample_proof=proofs[0],
                         sample_instances=insts[0])
    *_pair, ok = bv.verify(proofs, insts)  # warm
    assert ok
    t0 = time.time()
    reps = int(os.environ.get("BENCH_REPS", "3"))
    for _ in range(reps):
        *_pair, ok = bv.verify(proofs, insts)
        assert ok
    dt = (time.time() - t0) / reps
    return {
        "metric": "aggregated_proofs_verified_per_sec",
        "value": round(nproofs / dt, 3),
        "unit": f"proofs/s (batched-traced, batch {nproofs}, 1 chip, incl. pairing)",
        "vs_baseline": round(nproofs / dt / 32.0, 4),
    }


def bench_zkevm():
    """zkevm-shape workload (reference A27 zkevm_test at K=16 / C9): prove
    ZKEVM_NPROOFS wide multi-phase multi-lookup proofs at ZKEVM_K with the
    TPU-accelerated prover, then time hybrid-TPU aggregation verification
    (the per-proof MSMs now span ~40 commitments: 26 advice + lookups +
    permutation chunks). Opt-in via BENCH_ZKEVM=1."""
    import hashlib
    import pickle

    _configure_jax()
    from halo2_snark_aggregator_tpu.arith.tpu_value import make_tpu_chips
    from halo2_snark_aggregator_tpu.circuits.zkevm import ZkevmShapeCircuit
    from halo2_snark_aggregator_tpu.protocol import verify as pv
    from halo2_snark_aggregator_tpu.protocol.transcript import PoseidonTranscriptRead
    from halo2_snark_aggregator_tpu.prover.accel import create_proof_accel, keygen_accel
    from halo2_snark_aggregator_tpu.prover.srs import setup_cached_accel
    from halo2_snark_aggregator_tpu.transcript.host import PoseidonWrite

    k = int(os.environ.get("ZKEVM_K", "14"))
    nproofs = int(os.environ.get("ZKEVM_NPROOFS", "4"))
    params = setup_cached_accel(k)
    circuit = ZkevmShapeCircuit(k=k, seed=1)
    vk, apk = keygen_accel(circuit, k, params)

    cache = f"/tmp/bench_zkevm_proofs_k{k}_n{nproofs}.pkl"
    fp = hashlib.sha256(str(vk.transcript_repr()).encode()).hexdigest()[:16]
    proofs = None
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            tag, proofs = pickle.load(f)
        if tag != fp:
            proofs = None
    if proofs is None:
        proofs = []
        for i in range(nproofs):
            c = ZkevmShapeCircuit(k=k, seed=2 + i)
            proofs.append(
                (create_proof_accel(apk, params, [c], [c.instances()],
                                    PoseidonWrite(), seed=i),
                 c.instances()))
        with open(cache, "wb") as f:
            pickle.dump((fp, proofs), f)

    def run_once():
        ctx, nchip, schip, pchip = make_tpu_chips()
        pdata = [
            pv.ProofData(instances=[insts],
                         transcript=PoseidonTranscriptRead(pb, ctx, nchip),
                         key=f"p{i}")
            for i, (pb, insts) in enumerate(proofs)
        ]
        agg_t = PoseidonTranscriptRead(b"", ctx, nchip)
        # AccelParams exposes n/g_lagrange/g2/s_g2 — all the verifier reads
        cp = pv.CircuitProof(name="zkevm", vk=vk, params=params, proofs=pdata)
        *_, ok = pv.verify_aggregation_proofs_in_chip(
            ctx, nchip, schip, pchip, [cp], agg_t)
        assert ok
        return ok

    run_once()  # warm
    t0 = time.time()
    reps = int(os.environ.get("BENCH_REPS", "2"))
    for _ in range(reps):
        run_once()
    dt = (time.time() - t0) / reps
    return {
        "metric": "zkevm_shape_proofs_verified_per_sec",
        "value": round(nproofs / dt, 3),
        "unit": f"proofs/s (zkevm-shape K={k}, batch {nproofs}, 1 chip)",
        "vs_baseline": round(nproofs / dt / 32.0, 4),
    }


def _cached_zkevm_proofs(k: int, nproofs: int, n_groups: int = 8):
    """Prove (or load cached) zkevm-shape proofs with the TPU-accelerated
    prover; returns (params, vk, [(proof_bytes, instances)]).

    Cache layers, in order: /tmp pickles (fast, survives killed runs on one
    box) -> repo-committed fixtures under bench_fixtures/ (survive box moves:
    round 2's driver bench faulted partly because a fresh box had no proof
    cache and faced hours of re-proving) -> prove. Proofs are only valid for
    the exact vk, so every layer is keyed by the vk transcript fingerprint."""
    # Pin the PROVER's staged MSM to the XLA pregather path: proving is not
    # the timed metric (phases A/B never call msm_staged_split), and the
    # Pallas accumulate's one-time Mosaic compile is 10-20 min on a cold
    # 4-CPU box — enough to blow the driver's bench window when the proof
    # caches are empty. BENCH_MSM still exercises the Pallas default. The
    # pin is scoped to this function (saved/restored, advisor r3): the
    # timed verifier must NOT inherit it.
    accum_prev = os.environ.get("H2T_MSM_ACCUM")
    os.environ.setdefault("H2T_MSM_ACCUM", "pre")
    try:
        return _cached_zkevm_proofs_inner(k, nproofs, n_groups)
    finally:
        if accum_prev is None:
            os.environ.pop("H2T_MSM_ACCUM", None)
        else:
            os.environ["H2T_MSM_ACCUM"] = accum_prev


def _cached_zkevm_proofs_inner(k: int, nproofs: int, n_groups: int):
    import hashlib
    import json
    import pickle

    from halo2_snark_aggregator_tpu.circuits.zkevm import ZkevmShapeCircuit
    from halo2_snark_aggregator_tpu.prover.accel import (
        create_proof_accel,
        keygen_accel,
    )
    from halo2_snark_aggregator_tpu.prover.srs import setup_cached_accel
    from halo2_snark_aggregator_tpu.transcript.host import PoseidonWrite

    params = setup_cached_accel(k)
    circuit = ZkevmShapeCircuit(k=k, seed=1, n_groups=n_groups)
    vk, apk = keygen_accel(circuit, k, params)

    fp = hashlib.sha256(str(vk.transcript_repr()).encode()).hexdigest()[:16]
    fixture_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_fixtures")
    # one cache file per proof: a killed run (axon worker fault, session
    # restart) keeps every completed proof — losing 2.5h of proving to a
    # fault at proof 15/32 is how round 2 lost its first bench attempt
    proofs = []
    for i in range(nproofs):
        cache = f"/tmp/bench_zkevm_proof_k{k}_{fp}_{i}.pkl"
        if os.path.exists(cache):
            with open(cache, "rb") as f:
                proofs.append(pickle.load(f))
            continue
        fixture = os.path.join(fixture_dir, f"zkevm_proof_k{k}_{fp}_{i}.json")
        if os.path.exists(fixture):
            with open(fixture) as f:
                d = json.load(f)
            entry = (bytes.fromhex(d["proof"]),
                     [[int(v) for v in col] for col in d["instances"]])
            with open(cache, "wb") as f:
                pickle.dump(entry, f)
            proofs.append(entry)
            continue
        c = ZkevmShapeCircuit(k=k, seed=2 + i, n_groups=n_groups)
        t0 = time.time()
        # spill at K>=17 with wide circuits: the quotient's per-coset
        # extension cache holds (n,16) arrays per queried column — 131
        # columns at K=18 exceed HBM uncapped (harness uses k>=18; the
        # wide-groups knob lowers the threshold)
        spill = k >= 18 or (k >= 16 and n_groups > 16)
        entry = (create_proof_accel(apk, params, [c], [c.instances()],
                                    PoseidonWrite(), seed=i, spill=spill),
                 c.instances())
        with open(cache, "wb") as f:
            pickle.dump(entry, f)
        os.makedirs(fixture_dir, exist_ok=True)
        with open(fixture, "w") as f:
            json.dump({"proof": entry[0].hex(),
                       "instances": [[str(v) for v in col]
                                     for col in entry[1]]}, f)
        proofs.append(entry)
        print(f"proved zkevm-shape K={k} proof {i + 1}/{nproofs} "
              f"in {time.time() - t0:.1f}s", file=sys.stderr)
    return params, vk, proofs


def bench_zkevm_batched():
    """DEFAULT headline: fully-traced batched verification of zkevm-shape
    proofs at K>=16 — phase A (tape: transcript replay + challenge
    derivation + folded coefficients for all lanes) and phase B (flattened
    lambda-RLC Pippenger MSM) run as jitted device programs; only the
    aggregation-transcript squeeze and the final pairing stay on host
    (verify.rs:909-941 semantics). Honest accelerator number: the K=6
    host-C++ hybrid of round 1 never dispatched to device."""
    import jax

    _configure_jax()
    from halo2_snark_aggregator_tpu.protocol.batched import BatchedVerifier

    k = int(os.environ.get("ZKEVM_K", "16"))
    # Default: 4 unique proofs tiled 8x to a batch-32 verify. Proving a
    # K=16 proof costs minutes even warm (hours for 32 cold — how round 2's
    # driver bench died and fell back to a host number); verification work
    # is identical for duplicated lanes (full transcript replay, lambda
    # scaling, MSM entries per lane), and the unit string records the
    # tiling. ZKEVM_NPROOFS=32 ZKEVM_DUP=1 reproduces the round-2 shape.
    nproofs_env = os.environ.get("ZKEVM_NPROOFS")
    nproofs = int(nproofs_env) if nproofs_env else 4
    # ZKEVM_GROUPS widens the synthetic toward the real EvmCircuit's shape
    # (reference proves scroll's ~140-wide EvmCircuit at K=18,
    # benches/zkevm_bench.rs:34): 43 groups = 131 advice columns
    n_groups = int(os.environ.get("ZKEVM_GROUPS", "8"))
    params, vk, proofs = _cached_zkevm_proofs(k, nproofs, n_groups=n_groups)
    # ZKEVM_DUP=d tiles the proof set d times for batch-scaling experiments
    # (every lane still runs the full per-proof work — transcript replay,
    # lambda scaling, MSM entries — so duplicated lanes measure real
    # throughput; the unit string records the duplication). The 32x default
    # (batch 128) applies only when the user set NEITHER knob (advisor r3):
    # an explicit ZKEVM_NPROOFS=4 means a batch-4 run, not a silent
    # batch-128 one. Why 128: the sponge chain's wall time is nearly flat
    # in batch (serial 71-round permutations; lanes ride the VPU), so
    # throughput scales superlinearly until ~batch 128 (BENCH_SCALING_r05:
    # 9.2 -> 13.3 -> 25.7 -> 37.1 -> 70.8 proofs/s for batch 8..128).
    dup = int(os.environ.get("ZKEVM_DUP", "1" if nproofs_env else "32"))
    proofs = proofs * dup
    nproofs *= dup
    proof_bytes = [p for p, _ in proofs]
    insts = [i for _, i in proofs]

    platform = jax.devices()[0].platform
    bv = BatchedVerifier(vk, params, batch=nproofs, sample_proof=proof_bytes[0],
                         sample_instances=insts[0])
    print(f"batched verifier: {len(bv.tape.records)} tape records, "
          f"{sum(len(e) for e, _ in bv.msm_plans)} MSM entries/lane, "
          f"batch {nproofs}, device platform {platform}", file=sys.stderr)
    *_pair, ok = bv.verify(proof_bytes, insts)  # warm (compiles phases A+B)
    assert ok
    t0 = time.time()
    reps = int(os.environ.get("BENCH_REPS", "3"))
    for _ in range(reps):
        *_pair, ok = bv.verify(proof_bytes, insts)
        assert ok
    dt = (time.time() - t0) / reps
    dup_note = f", {dup}x-tiled proof set" if dup > 1 else ""
    grp_note = f", {3 * n_groups + 2} advice cols" if n_groups != 8 else ""
    return {
        "metric": "zkevm_shape_proofs_verified_per_sec",
        "value": round(nproofs / dt, 3),
        "unit": (f"proofs/s (batched-traced zkevm-shape K={k}{grp_note}, "
                 f"batch {nproofs}{dup_note}, phases A+B on {platform}, "
                 f"incl. pairing)"),
        "vs_baseline": round(nproofs / dt / 32.0, 4),
    }


def bench_outer():
    """Outer aggregation proof wall-clock (the reference's zkevm-bench
    analog: MultiCircuitsCreateProof at aggregator k — TPU-accelerated
    prover, SHA256 transcript, followed by a native verify). Opt-in via
    BENCH_OUTER=1; OUTER_K selects the aggregator size (default 20).

    vs_baseline is against a 600s working target for a k=22 halo2 outer
    proof on the reference's 24-thread CPU setup (no published numbers —
    BASELINE.md)."""
    import logging

    logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                        format="%(asctime)s %(levelname)s %(message)s")
    _configure_jax()
    from halo2_snark_aggregator_tpu.sdk import harness
    from halo2_snark_aggregator_tpu.sdk.cli import demo_spec
    from halo2_snark_aggregator_tpu.utils.store import FolderStore

    agg_k = int(os.environ.get("OUTER_K", "20"))
    store = FolderStore(os.environ.get("OUTER_FOLDER", "/tmp/bench_outer"))
    spec = demo_spec()
    # the dense gadget layout costs ~930k rows per inner proof: one proof
    # fits k=20, two fit k=21 (the reference needs k=22 for two,
    # simple-example.rs:361-363); use OUTER_K=21 OUTER_NPROOFS=2 for the
    # 2-proof shape
    spec.n_proofs = int(os.environ.get("OUTER_NPROOFS", "1"))
    if not store.exists(f"sample_circuit_{spec.name}.params"):
        harness.sample_setup(spec, store)
        harness.sample_run(spec, store)
    t0 = time.time()
    proof, _instances = harness.verify_run([spec], store, agg_k=agg_k)
    dt = time.time() - t0
    harness.verify_check_outer(store, agg_k=agg_k)
    return {
        "metric": "outer_proof_seconds",
        "value": round(dt, 1),
        "unit": f"s (aggregator k={agg_k}, {len(proof)}B proof, 1 chip)",
        "vs_baseline": round(600.0 / dt, 3),
    }


def bench_recurse():
    """Two-layer recursion (the reference's 'Multi-layer aggregator' future
    work): target proofs -> layer-1 aggregation proof (Poseidon transcript,
    TPU prover) -> layer-2 aggregation proof of the layer-1 proof (SHA
    transcript) -> native verify. Opt-in via BENCH_RECURSE=1."""
    import logging

    logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                        format="%(asctime)s %(levelname)s %(message)s")
    _configure_jax()
    from halo2_snark_aggregator_tpu.sdk import harness
    from halo2_snark_aggregator_tpu.sdk.cli import demo_spec
    from halo2_snark_aggregator_tpu.utils.store import FolderStore

    l1_k = int(os.environ.get("RECURSE_L1_K", "20"))
    l2_k = int(os.environ.get("RECURSE_L2_K", "20"))
    root = os.environ.get("RECURSE_FOLDER", "/tmp/bench_recurse")
    l1 = FolderStore(os.path.join(root, "l1"))
    l2 = FolderStore(os.path.join(root, "l2"))
    spec = demo_spec()
    spec.n_proofs = 1
    if not l1.exists(f"sample_circuit_{spec.name}.params"):
        harness.sample_setup(spec, l1)
        harness.sample_run(spec, l1)
    t0 = time.time()
    harness.verify_run([spec], l1, agg_k=l1_k, transcript="poseidon")
    harness.verify_check_l1_poseidon(l1, agg_k=l1_k)
    proof2, _ = harness.verify2_run(l1, l2, l1_k, l2_k)
    harness.verify2_check(l2, l2_k)
    dt = time.time() - t0
    return {
        "metric": "two_layer_recursion_seconds",
        "value": round(dt, 1),
        "unit": f"s (l1 k={l1_k} -> l2 k={l2_k}, {len(proof2)}B final proof, 1 chip)",
        "vs_baseline": round(1200.0 / dt, 3),
    }


def _select_bench():
    if os.environ.get("BENCH_MSM"):
        return bench_msm
    if os.environ.get("BENCH_MULTIHOST"):
        return bench_multihost
    if os.environ.get("BENCH_RECURSE"):
        return bench_recurse
    if os.environ.get("BENCH_BATCHED"):
        return bench_batched
    if os.environ.get("BENCH_ZKEVM"):
        return bench_zkevm
    if os.environ.get("BENCH_OUTER"):
        return bench_outer
    if os.environ.get("BENCH_HYBRID"):
        return bench_aggregation
    return bench_zkevm_batched


if __name__ == "__main__":
    import traceback

    bench_fn = _select_bench()
    try:
        result = bench_fn()
    except Exception:
        # Retry ONCE: axon worker faults are frequently transient (tunnel
        # drain, worker restart), and the first attempt's persistent compile
        # cache makes the retry cheap. Give a killed worker time to drain.
        traceback.print_exc(file=sys.stderr)
        print("bench attempt 1 failed; retrying once in 60s", file=sys.stderr)
        if os.environ.get("BENCH_NO_FALLBACK"):
            raise
        time.sleep(60)
        try:
            result = bench_fn()
        except Exception as exc:
            # NO silent host-fallback headline (round 2's driver artifact was
            # a CPU number tagged only in the unit string). A host fallback
            # now requires explicit opt-in and is marked invalid for
            # comparison; default is to fail loudly.
            if os.environ.get("BENCH_ALLOW_FALLBACK"):
                result = bench_aggregation(use_tpu=False)
                result["unit"] += (
                    f" [INVALID FOR BASELINE: host fallback after accelerator "
                    f"failure: {type(exc).__name__}]")
                result["vs_baseline"] = 0.0
            else:
                raise
    print(json.dumps(result))
