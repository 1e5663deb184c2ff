"""On-chain final-pair entry (reference verifier.sol:356-397): the contract
packs the target circuits' raw (w_x, w_g) into the leading 136-bit instance
words itself and pairing-checks the inner pair against the target G2 points
before running the outer verifier.

Tested against a stub get_wx_wg so the packing and the target pairing gate
are validated in isolation (the full outer flow runs in the verify_solidity
CLI stage once verify_run has stored an outer proof)."""

import pytest

from halo2_snark_aggregator_tpu.ff import bn254 as ff
from halo2_snark_aggregator_tpu.protocol.instances import (
    final_pair_to_instances,
)
from halo2_snark_aggregator_tpu.prover.kzg import ParamsKZG
from halo2_snark_aggregator_tpu.solidity.render import (
    _sol_pairing,
    _verify_entries,
)
from halo2_snark_aggregator_tpu.solidity.sol_exec import SolidityExecutor

IW = 6  # 4 packed pair words + 2 inner publics


def _stub_contract(params, expected_inst):
    """A contract whose get_wx_wg returns a pairing-passing outer pair ONLY
    when `instances` matches the expected packed vector — so a packing
    mismatch fails the outer pairing_check."""
    tg2 = (params.s_g2, ff.g2_neg(params.g2))
    wx, wg = ff.G1_GEN, params.g[1]  # e(G, [s]G2) * e([s]G, -G2) == 1
    checks = " && ".join(
        f"instances[{i}] == {v}" for i, v in enumerate(expected_inst)
    )
    return f"""
contract Verifier {{
    uint256 constant Q_MOD = {ff.P};
    uint256 constant R_MOD = {ff.R};

{_sol_pairing(params.s_g2, ff.g2_neg(params.g2))}

    function get_wx_wg(uint256[] calldata proof,
                       uint256[{IW}] memory instances)
        internal view returns (uint256, uint256, uint256, uint256)
    {{
        if ({checks}) {{
            return ({wx[0]}, {wx[1]}, {wg[0]}, {wg[1]});
        }}
        return (1, 1, 1, 1);
    }}
{_verify_entries(0, IW, tg2)}
}}
"""


@pytest.fixture(scope="module")
def setup():
    params = ParamsKZG.unsafe_setup(4)
    w_x, w_g = ff.G1_GEN, params.g[1]  # a pair that passes the target check
    inner = [17, 23]
    expected = final_pair_to_instances(w_x, w_g, inner)
    src = _stub_contract(params, expected)
    return params, w_x, w_g, inner, expected, SolidityExecutor(src)


def test_onchain_packing_matches_host(setup):
    params, w_x, w_g, inner, expected, ex = setup
    fp = [w_x[0], w_x[1], w_g[0], w_g[1]]
    # the stub only returns the passing pair if the packed instances match
    # final_pair_to_instances exactly
    assert ex.call("verify_final_pair", [[], fp, inner]) is True


def test_target_pairing_gate_rejects_bad_pair(setup):
    params, w_x, w_g, inner, expected, ex = setup
    bad_wg = ff.g1_double(w_g)  # not [s]*w_x
    fp = [w_x[0], w_x[1], bad_wg[0], bad_wg[1]]
    with pytest.raises(Exception, match="target pairing failed"):
        ex.call("verify_final_pair", [[], fp, inner])


def test_packing_mismatch_fails_outer_check(setup):
    params, w_x, w_g, inner, expected, ex = setup
    fp = [w_x[0], w_x[1], w_g[0], w_g[1]]
    # wrong inner publics -> packed vector differs -> stub returns a
    # non-passing pair -> outer pairing_check returns false
    assert ex.call("verify_final_pair", [[], fp, [inner[0] + 1, inner[1]]]) \
        is False


def test_plain_verify_copies_instances(setup):
    params, w_x, w_g, inner, expected, ex = setup
    assert ex.call("verify", [[], list(expected)]) is True
    wrong = list(expected)
    wrong[0] ^= 1
    assert ex.call("verify", [[], wrong]) is False
