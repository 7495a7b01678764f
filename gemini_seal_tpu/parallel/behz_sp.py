"""Explicit limb-sharded BFV BEHZ multiply (+relinearize).

The BEHZ base-extension contraction (reference: rns.cpp:452-523 FastBConv,
925-1068 sm_mrq/fastbconv_m_tilde) is SURVEY §2.4's canonical sharded
matmul.  This module hand-schedules benchmark config 1/3's hot step on the
same communication-minimal pattern as parallel/keyswitch_sp.py:

- each device owns n_ct/C rows of the q base AND ceil(n_Bsk/C) rows of a
  zero-PADDED Bsk base (pad rows reuse row-0 constants and are excluded
  from every contraction by zero matrix columns);
- every base conversion is ONE tiled all_gather of the pre-scaled source
  rows followed by a device-local 128-bit-exact contraction onto the
  device's own output rows (the m_tilde and m_sk single-row conversions
  are computed redundantly on every device — sub-percent extra compute,
  zero extra ICI hops, exactly like keyswitch_sp's special rows);
- the whole multiply+relinearize runs in FIVE all-gathers: two operand
  extends (q -> Bsk u {m_tilde}), one fast_floor lift (q -> Bsk), one
  Shenoy-Kumaresan return (Bsk -> q), one relin key-switch target — vs
  the GSPMD profile's all-reduce + permute mix over the larger digit
  tensors.

Bit-exact with models.pipelines.build_bfv_mul_relin: identical lazy NTT
ranges, identical accumulate_mulmod_128 contraction order (ascending
global input row), row-sliced copies of the same DeviceRNSTool constants.

Supports the (dp, limb) production mesh: batch axes enter dp-sharded and
all collectives name only 'limb' (see keyswitch_sp._data_spec).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import modops
from ..ops.keyswitch import KeySwitchPlan
from ..ops.ntt import ntt_forward_lazy, ntt_inverse
from .keyswitch_sp import (_data_spec, _jit_cached, _plan_consts, _sp_consts,
                           _switch_local, _tables_from, _tables_rows,
                           _TAB_FIELDS)
from .ntt_sp import shard_map

__all__ = ["bfv_mul_relin_limb_sharded"]


def _acc128(pairs, p, r0, r1):
    return modops.accumulate_mulmod_128(pairs, p, r0, r1)


def _pad_rows(arr: np.ndarray, rows: int) -> np.ndarray:
    """Pad axis 0 to `rows` by repeating row 0 (valid constants; outputs
    from pad rows are never read)."""
    if arr.shape[0] == rows:
        return np.ascontiguousarray(arr)
    pad = np.broadcast_to(arr[0:1], (rows - arr.shape[0],) + arr.shape[1:])
    return np.ascontiguousarray(np.concatenate([arr, pad], axis=0))


def _behz_consts(tool, plan: KeySwitchPlan, mesh: Mesh):
    """Row-sharded BEHZ constants, device_put once per (tool, mesh)."""
    cache = tool.__dict__.setdefault("_behz_sp_cache", {})
    nkey = (tuple(mesh.devices.flat), tuple(sorted(mesh.shape.items())),
            mesh.axis_names)
    hit = cache.get(nkey)
    if hit is not None:
        return hit

    C = mesh.shape["limb"]
    n_ct = tool.base_q_size
    n_bsk = tool.base_Bsk_size
    n_b = tool.base_B_size
    ext_pad = ((n_bsk + C - 1) // C) * C

    # --- q-sharded rows -------------------------------------------------
    qtab = {f: np.asarray(getattr(plan.ct_tables, f)) for f in _TAB_FIELDS}
    bq_mat = np.zeros((n_ct, ext_pad), dtype=np.uint64)
    bq_mat[:, :n_b] = tool.B_to_q.matrix
    cq = {
        "tab": qtab,
        "p": tool.q_limbs.p, "r0": tool.q_limbs.ratio0,
        "r1": tool.q_limbs.ratio1,
        "invp": tool.q_to_Bsk.inv_punctured,          # [n_ct, 1]
        "bq_mat": bq_mat,                              # [n_ct, ext_pad]
        "prod_B": tool.prod_B_mod_q,                   # [n_ct, 1]
    }
    cq_specs = {
        "tab": {f: P("limb", *([None] * (v.ndim - 1)))
                for f, v in qtab.items()},
        "p": P("limb", None), "r0": P("limb", None), "r1": P("limb", None),
        "invp": P("limb", None),
        "bq_mat": P("limb", None),
        "prod_B": P("limb", None),
    }

    # --- padded-Bsk-sharded rows ---------------------------------------
    btab_full = {f: np.asarray(getattr(tool.base_Bsk_ntt_tables, f))
                 for f in _TAB_FIELDS}
    btab = {f: _pad_rows(v, ext_pad) for f, v in btab_full.items()}
    bsk = tool.Bsk_limbs
    invp_b = np.zeros((ext_pad, 1), dtype=np.uint64)
    invp_b[:n_b] = tool.B_to_q.inv_punctured[:n_b]
    msk_mask = np.zeros((ext_pad, 1), dtype=np.uint64)
    msk_mask[n_b, 0] = 1  # the m_sk row passes through RAW in the sk-gather
    ce = {
        "tab": btab,
        "p": _pad_rows(bsk.p, ext_pad),
        "r0": _pad_rows(bsk.ratio0, ext_pad),
        "r1": _pad_rows(bsk.ratio1, ext_pad),
        "qbsk_mat": _pad_rows(tool.q_to_Bsk.matrix, ext_pad),  # [ext_pad, n_ct]
        "prod_q": _pad_rows(tool.prod_q_mod_Bsk, ext_pad),
        "inv_mt": _pad_rows(tool.inv_m_tilde_mod_Bsk, ext_pad),
        "inv_prod_q": _pad_rows(tool.inv_prod_q_mod_Bsk, ext_pad),
        "invp_B": invp_b,
        "msk_mask": msk_mask,
    }
    ce_specs = {
        "tab": {f: P("limb", *([None] * (v.ndim - 1)))
                for f, v in btab.items()},
        "p": P("limb", None), "r0": P("limb", None), "r1": P("limb", None),
        "qbsk_mat": P("limb", None),
        "prod_q": P("limb", None),
        "inv_mt": P("limb", None),
        "inv_prod_q": P("limb", None),
        "invp_B": P("limb", None),
        "msk_mask": P("limb", None),
    }

    # --- replicated single-row constants -------------------------------
    bmsk_mat = np.zeros((1, ext_pad), dtype=np.uint64)
    bmsk_mat[0, :n_b] = tool.B_to_m_sk.matrix[0]
    mt_ob = tool.q_to_m_tilde.obase
    cr = {
        "qmt_mat": np.asarray(tool.q_to_m_tilde.matrix),   # [1, n_ct]
        "bmsk_mat": bmsk_mat,                               # [1, ext_pad]
        "mt_p": mt_ob.p, "mt_r0": mt_ob.ratio0, "mt_r1": mt_ob.ratio1,
    }
    cr_specs = {k: P() for k in cr}

    consts = {"q": cq, "e": ce, "r": cr}
    specs = {"q": cq_specs, "e": ce_specs, "r": cr_specs}
    consts = jax.device_put(
        consts,
        jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                     is_leaf=lambda x: isinstance(x, P)),
    )
    meta = {
        "n_ct": n_ct, "n_bsk": n_bsk, "n_b": n_b, "ext_pad": ext_pad,
        "m_tilde": np.uint64(tool.m_tilde.value),
        "inv_q_mt": np.uint64(tool.inv_prod_q_mod_m_tilde),
        "m_sk": np.uint64(tool.m_sk.value),
        "msk_r0": np.uint64(tool.m_sk.const_ratio[0]),
        "msk_r1": np.uint64(tool.m_sk.const_ratio[1]),
        "inv_B_msk": np.uint64(tool.inv_prod_B_mod_m_sk),
        "t": np.uint64(tool.t.value),
    }
    cache[nkey] = (consts, specs, meta)
    return consts, specs, meta


def bfv_mul_relin_limb_sharded(a, b, key_vector_data, context, mesh: Mesh,
                               parms_id=None):
    """BFV BEHZ multiply + relinearize over a limb-sharded mesh.

    a, b: GLOBAL u64[.., 2, n_ct, N] power-basis ciphertext data sharded
    P(..., None, 'limb', None) (plus 'dp' on the leading batch axis when
    the mesh has one).  key_vector_data: u64[nb, 2, L_key, N].  Returns
    u64[.., 2, n_ct, N] with the inputs' sharding — bit-exact with
    jit(build_bfv_mul_relin(context))(a, b, key).
    """
    if parms_id is None:
        parms_id = context.first_parms_id
    cd = context.get_context_data(parms_id)
    tool = cd.device_rns_tool
    plan = KeySwitchPlan(context, parms_id)
    C = mesh.shape["limb"]
    if plan.n_ct_rns % C != 0:
        raise ValueError(f"n_ct={plan.n_ct_rns} not divisible by limb={C}")
    cc_power = plan.ct_tables.coeff_count_power
    cc = plan.ct_tables.coeff_count

    consts, specs, meta = _behz_consts(tool, plan, mesh)
    norm, norm_specs = _plan_consts(plan, mesh, key_vector_data)
    sp_rows, sp_tables = _sp_consts(plan)
    n_ct, n_b, ext_pad = meta["n_ct"], meta["n_b"], meta["ext_pad"]
    m_tilde = meta["m_tilde"]
    mt_half = np.uint64(int(m_tilde) >> 1)
    mask32 = np.uint64(0xFFFFFFFF)

    def f(a_local, b_local, c, norm_c):
        cq, ce, cr = c["q"], c["e"], c["r"]
        tab_q = _tables_from(cq["tab"], cc_power, cc)
        tab_e = _tables_from(ce["tab"], cc_power, cc)
        gather = lambda x: jax.lax.all_gather(
            x, "limb", axis=x.ndim - 2, tiled=True
        )

        def extend(x):
            """x: [.., own_q, N] power basis -> (q_ntt lazy, bsk_ntt lazy)."""
            q_ntt = ntt_forward_lazy(x, tab_q)
            temp = modops.mul_mod(x, m_tilde, cq["p"], cq["r0"], cq["r1"])
            scaled = modops.mul_mod(temp, cq["invp"], cq["p"], cq["r0"], cq["r1"])
            g = gather(scaled)                              # [.., n_ct, N]
            bsk_own = _acc128(
                ((g[..., None, i, :], ce["qbsk_mat"][:, i, None])
                 for i in range(n_ct)),
                ce["p"], ce["r0"], ce["r1"],
            )                                               # [.., own_e, N]
            # m_tilde single-row conversion, redundantly on every device
            # (128-bit-exact, same as the in-core q_to_m_tilde converter)
            mt = _acc128(
                ((g[..., None, i, :], cr["qmt_mat"][:, i, None])
                 for i in range(n_ct)),
                cr["mt_p"], cr["mt_r0"], cr["mt_r1"],
            )
            x_mt = mt[..., 0, :]
            # sm_mrq on own Bsk rows (rns.cpp:925-981)
            r = (x_mt * meta["inv_q_mt"]) & mask32
            r = (m_tilde - r) & mask32
            r_b = r[..., None, :]
            r_c = jnp.where(r_b >= mt_half, r_b + (ce["p"] - m_tilde), r_b)
            qr_hi, qr_lo = modops.mul64_wide(ce["prod_q"], r_c)
            s_lo = qr_lo + bsk_own
            s_hi = qr_hi + (s_lo < qr_lo).astype(jnp.uint64)
            acc = modops.barrett_reduce_128(
                s_hi, s_lo, ce["p"], ce["r0"], ce["r1"]
            )
            bsk = modops.mul_mod(acc, ce["inv_mt"], ce["p"], ce["r0"], ce["r1"])
            return q_ntt, ntt_forward_lazy(bsk, tab_e)

        mmq = lambda x, y: modops.mul_mod(x, y, cq["p"], cq["r0"], cq["r1"])
        mme = lambda x, y: modops.mul_mod(x, y, ce["p"], ce["r0"], ce["r1"])
        addq = lambda x, y: modops.add_mod(x, y, cq["p"])
        adde = lambda x, y: modops.add_mod(x, y, ce["p"])

        # both components extend together (batch axis) -> ONE gather per
        # operand, as documented
        aq2, ae2 = extend(a_local)
        bq2, be2 = extend(b_local)
        a0q, a1q = aq2[..., 0, :, :], aq2[..., 1, :, :]
        a0e, a1e = ae2[..., 0, :, :], ae2[..., 1, :, :]
        b0q, b1q = bq2[..., 0, :, :], bq2[..., 1, :, :]
        b0e, b1e = be2[..., 0, :, :], be2[..., 1, :, :]

        # size-2 x size-2 convolution, per base (local rows)
        dq = jnp.stack([
            mmq(a0q, b0q),
            addq(mmq(a0q, b1q), mmq(a1q, b0q)),
            mmq(a1q, b1q),
        ], axis=-3)                                         # [.., 3, own_q, N]
        de = jnp.stack([
            mme(a0e, b0e),
            adde(mme(a0e, b1e), mme(a1e, b0e)),
            mme(a1e, b1e),
        ], axis=-3)

        q_part = ntt_inverse(dq, tab_q)
        e_part = ntt_inverse(de, tab_e)
        tq = mmq(q_part, meta["t"])
        te = mme(e_part, meta["t"])

        # fast_floor (rns.cpp:983-1023): q -> Bsk conversion of tq
        scaled_tq = mmq(tq, cq["invp"])
        g = gather(scaled_tq)                               # [.., 3, n_ct, N]
        conv = _acc128(
            ((g[..., None, i, :], ce["qbsk_mat"][:, i, None])
             for i in range(n_ct)),
            ce["p"], ce["r0"], ce["r1"],
        )
        floor = mme(te + (ce["p"] - conv), ce["inv_prod_q"])

        # fastbconv_sk (rns.cpp:853-923): Bsk -> q
        scaled_fl = mme(floor, ce["invp_B"])                # 0 on m_sk/pad
        g2 = gather(scaled_fl + floor * ce["msk_mask"])     # [.., 3, ext_pad, N]
        dest = _acc128(
            ((g2[..., None, i, :], cq["bq_mat"][:, i, None])
             for i in range(n_b)),
            cq["p"], cq["r0"], cq["r1"],
        )                                                   # [.., 3, own_q, N]
        temp_msk = _acc128(
            ((g2[..., None, i, :], cr["bmsk_mat"][:, i, None])
             for i in range(n_b)),
            meta["m_sk"], meta["msk_r0"], meta["msk_r1"],
        )[..., 0, :]
        x_sk = g2[..., n_b, :]
        m_sk = meta["m_sk"]
        diff = temp_msk + (m_sk - x_sk)
        alpha = modops.mul_mod(
            diff, meta["inv_B_msk"], m_sk, meta["msk_r0"], meta["msk_r1"]
        )
        alpha_b = alpha[..., None, :]
        neg_term = mmq(m_sk - alpha_b, cq["prod_B"])
        pos_term = mmq(alpha_b, cq["p"] - cq["prod_B"])
        term = jnp.where(alpha_b > (m_sk >> np.uint64(1)), neg_term, pos_term)
        out = addq(dest, term)                              # [.., 3, own_q, N]

        # relinearize: explicit power-basis switch on component 2
        d0, d1 = _switch_local(
            out[..., 2, :, :], norm_c, tab_q, plan, sp_rows, sp_tables,
            is_ntt_form=False,
        )
        u0 = addq(out[..., 0, :, :], d0)
        u1 = addq(out[..., 1, :, :], d1)
        return jnp.stack([u0, u1], axis=-3)

    nd = a.ndim
    spec = _data_spec(nd, mesh, 3)

    def build():
        return shard_map(f, mesh, in_specs=(spec, spec, specs, norm_specs),
                         out_specs=spec)

    fn = _jit_cached(plan, mesh, "behz_mul_relin", nd, build)
    return fn(a, b, consts, norm)
