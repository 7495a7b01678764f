"""Coefficient-sharded (sequence-parallel) serving pipeline.

VERDICT r2 item 4: the NTT-SP transforms (parallel/ntt_sp.py) composed
END-TO-END.  For the deep-N latency regime (N = 32768/65536) the limb
axis saturates at C ≈ L; sharding the COEFFICIENT axis instead keeps
scaling: every non-NTT op of the hot step (dyadic products, mod-up
digit contraction over limbs, key inner product over bundles, rescale
corrections) is elementwise over N and therefore LOCAL under coefficient
sharding — the only communication is inside each NTT, where the
four-step/Bailey schedule costs exactly two all_to_all transposes
(SURVEY §5 long-context mapping; no reference analogue).

Implementation: ops.keyswitch and ops.rnsops take a pluggable NTT
strategy (keyswitch.NTTOps); this module passes the all_to_all four-step
local bodies and wraps the UNCHANGED in-core dataflow in one shard_map —
single-source math, bit-exact by construction (pinned by
tests/test_pipeline_csp.py against the in-core step).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import modops
from ..ops.keyswitch import KeySwitchPlan, NTTOps, switch_key
from ..ops.rnsops import divide_and_round_q_last_ntt
from .keyswitch_sp import _jit_cached
from .ntt_sp import (_check_4step, forward_4step_local, inverse_4step_local,
                     shard_map)

__all__ = ["switch_key_coeff_sharded", "ckks_mul_relin_rescale_coeff_sharded"]


class _CoeffShardedNTT(NTTOps):
    """NTT strategy whose four entry points are the four-step all_to_all
    bodies, for use INSIDE a shard_map over `coeff_axis`."""

    def __init__(self, C: int, coeff_axis: str):
        self.forward = lambda x, t: forward_4step_local(x, t, C, coeff_axis)
        self.forward_lazy = lambda x, t: forward_4step_local(
            x, t, C, coeff_axis, lazy=True
        )
        self.inverse = lambda x, t: inverse_4step_local(x, t, C, coeff_axis)
        self.inverse_lazy = lambda x, t: inverse_4step_local(
            x, t, C, coeff_axis, lazy=True
        )


def _coeff_spec(nd: int, mesh: Mesh, coeff_axis: str, n_struct: int) -> P:
    """[batch..., <n_struct structural axes ending in N>] data: shard the
    last axis over `coeff_axis`, and 'dp' on the leading batch axis when
    the mesh has one and batch dims exist (n_struct = 2 for [L, N]
    targets, 3 for [size, L, N] ciphertexts)."""
    lead = [None] * (nd - 1)
    if "dp" in mesh.axis_names and nd > n_struct:
        lead[0] = "dp"
    return P(*(lead + [coeff_axis]))


def switch_key_coeff_sharded(target, key_vector_data, plan: KeySwitchPlan,
                             mesh: Mesh, is_ntt_form: bool = True,
                             coeff_axis: str = "coeff"):
    """Hybrid key switch with the COEFFICIENT axis sharded.

    target: GLOBAL u64[.., n_ct, N] sharded P(..., coeff_axis);
    key_vector_data: u64[nb, 2, L_key, N] sharded on N.  Returns (d0, d1)
    with the target's sharding — bit-exact vs ops.keyswitch.switch_key.
    Comm: 2 all_to_alls per NTT invocation, nothing else.
    """
    C = mesh.shape[coeff_axis]
    _check_4step(plan.ct_tables.coeff_count, C)
    nttops = _CoeffShardedNTT(C, coeff_axis)

    def f(tgt_local, key_local):
        return switch_key(tgt_local, key_local, plan, is_ntt_form, ntt=nttops)

    nd = target.ndim
    spec = _coeff_spec(nd, mesh, coeff_axis, 2)
    kspec = P(None, None, None, coeff_axis)

    def build():
        return shard_map(f, mesh, in_specs=(spec, kspec),
                         out_specs=(spec, spec))

    fn = _jit_cached(plan, mesh, ("csp_switch", is_ntt_form), nd, build)
    return fn(target, key_vector_data)


def ckks_mul_relin_rescale_coeff_sharded(a, b, key_vector_data,
                                         plan: KeySwitchPlan, mesh: Mesh,
                                         coeff_axis: str = "coeff"):
    """The full CKKS hot step (multiply + relinearize + rescale) with the
    coefficient axis sharded — the deep-N serving layout.

    a, b: GLOBAL u64[.., 2, n_ct, N] NTT form sharded P(..., coeff_axis).
    Returns u64[.., 2, n_ct-1, N] at the next level, same sharding —
    bit-exact vs models.pipelines.build_ckks_mul_relin_rescale.
    """
    C = mesh.shape[coeff_axis]
    _check_4step(plan.ct_tables.coeff_count, C)
    nttops = _CoeffShardedNTT(C, coeff_axis)
    q = plan.ct_limbs
    tool = plan.device_rns_tool
    tables = plan.ct_tables

    def f(a_local, b_local, key_local):
        a0, a1 = a_local[..., 0, :, :], a_local[..., 1, :, :]
        b0, b1 = b_local[..., 0, :, :], b_local[..., 1, :, :]
        mm = lambda x, y: modops.mul_mod(x, y, q.p, q.ratio0, q.ratio1)
        c0 = mm(a0, b0)
        c1 = modops.add_mod(mm(a0, b1), mm(a1, b0), q.p)
        c2 = mm(a1, b1)
        d0, d1 = switch_key(c2, key_local, plan, True, ntt=nttops)
        u = jnp.stack([
            modops.add_mod(c0, d0, q.p),
            modops.add_mod(c1, d1, q.p),
        ], axis=-3)
        return divide_and_round_q_last_ntt(u, tool, tables, ntt=nttops)

    nd = a.ndim
    spec = _coeff_spec(nd, mesh, coeff_axis, 3)
    kspec = P(None, None, None, coeff_axis)

    def build():
        return shard_map(f, mesh, in_specs=(spec, spec, kspec),
                         out_specs=spec)

    fn = _jit_cached(plan, mesh, "csp_mrr", nd, build)
    return fn(a, b, key_vector_data)
