"""Example 10: multi-chip sharded serving on a virtual device mesh.

The three explicit TPU-pod schedules of the parallel plane, demonstrated
on an 8-virtual-device CPU mesh (the same code runs unchanged on a real
pod — see PERF.md's ICI comm tables for the measured profiles):

1. (dp=2, limb=4) production mesh — the CKKS hot step on the explicit
   ONE-all-gather schedule (parallel/keyswitch_sp.py), batch axis
   data-parallel at zero ICI cost;
2. BFV BEHZ multiply+relinearize in exactly FIVE all-gathers
   (parallel/behz_sp.py);
3. coefficient-sharded deep-N layout (parallel/pipeline_csp.py) — the
   four-step all_to_all NTT composed through the whole step.

Every result is checked bit-exact against the in-core pipeline.

Usage: python ex10_sharded_serving.py
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np

from common import print_parameters

import jax

jax.config.update("jax_platforms", "cpu")

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gemini_seal_tpu import (
    CKKSEncoder,
    CoeffModulus,
    EncryptionParameters,
    Encryptor,
    KeyGenerator,
    PlainModulus,
    Plaintext,
    SchemeType,
    SecLevelType,
    SealContext,
)
from gemini_seal_tpu.models.pipelines import (
    build_bfv_mul_relin,
    build_ckks_mul_relin_rescale,
)
from gemini_seal_tpu.ops.keyswitch import KeySwitchPlan
from gemini_seal_tpu.parallel.behz_sp import bfv_mul_relin_limb_sharded
from gemini_seal_tpu.parallel.keyswitch_sp import (
    ckks_mul_relin_rescale_limb_sharded,
)
from gemini_seal_tpu.parallel.pipeline_csp import (
    ckks_mul_relin_rescale_coeff_sharded,
)


def ckks_ctx(n, bits, nsp=1):
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, bits))
    parms.set_n_special_primes(nsp)
    ctx = SealContext(parms, sec_level=SecLevelType.none)
    return ctx, KeyGenerator(ctx)


def main():
    devices = jax.devices()
    assert len(devices) >= 8, "needs 8 (virtual) devices"

    # ---- 1) (dp=2, limb=4): explicit one-gather CKKS hot step ----------
    ctx, kg = ckks_ctx(1024, [30] * 9, nsp=1)
    print_parameters(ctx)
    enc = Encryptor(ctx, public_key=kg.public_key())
    encoder = CKKSEncoder(ctx)
    rk = kg.relin_keys()
    plan = KeySwitchPlan(ctx, ctx.first_parms_id)
    n_ct = plan.n_ct_rns

    batch = 4
    a = np.stack([
        np.asarray(enc.encrypt(encoder.encode([0.5 * (i + 1), -i], 2.0 ** 25)).data)
        for i in range(batch)
    ])
    kdata = np.stack([np.asarray(pk.data.data) for pk in rk.key(2)])
    want = np.asarray(jax.jit(build_ckks_mul_relin_rescale(ctx))(a, a, kdata))

    mesh = Mesh(np.asarray(devices).reshape(2, 4), axis_names=("dp", "limb"))
    sh = NamedSharding(mesh, P("dp", None, "limb", None))
    out = np.asarray(ckks_mul_relin_rescale_limb_sharded(
        jax.device_put(a, sh), jax.device_put(a, sh), kdata, plan, mesh
    ))
    assert np.array_equal(out[..., : n_ct - 1, :], want)
    print(f"1) (dp=2, limb=4) explicit CKKS mul+relin+rescale: "
          f"batch {batch} bit-exact (1 all-gather + 1 tiny all-reduce)")

    # ---- 2) BFV BEHZ in five all-gathers -------------------------------
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(1024)
    parms.set_coeff_modulus(CoeffModulus.create(1024, [30] * 9))
    parms.set_plain_modulus(PlainModulus.batching(1024, 20).value)
    bctx = SealContext(parms, sec_level=SecLevelType.none)
    bkg = KeyGenerator(bctx)
    benc = Encryptor(bctx, public_key=bkg.public_key())
    brk = bkg.relin_keys()
    ba = np.asarray(benc.encrypt(Plaintext.from_hex("3x^2 + 2")).data)
    bb = np.asarray(benc.encrypt(Plaintext.from_hex("5x^1 + 7")).data)
    bk = np.stack([np.asarray(pk.data.data) for pk in brk.key(2)])
    bwant = np.asarray(jax.jit(build_bfv_mul_relin(bctx))(ba, bb, bk))

    lmesh = Mesh(np.asarray(devices[:4]), axis_names=("limb",))
    lsh = NamedSharding(lmesh, P(None, "limb", None))
    bout = np.asarray(bfv_mul_relin_limb_sharded(
        jax.device_put(ba, lsh), jax.device_put(bb, lsh), bk, bctx, lmesh
    ))
    assert np.array_equal(bout, bwant)
    print("2) BFV BEHZ multiply+relin on the five-gather schedule: bit-exact")

    # ---- 3) coefficient-sharded deep-N layout --------------------------
    cctx, ckg = ckks_ctx(4096, [30] * 8, nsp=1)
    cenc = Encryptor(cctx, public_key=ckg.public_key())
    cencoder = CKKSEncoder(cctx)
    crk = ckg.relin_keys()
    cplan = KeySwitchPlan(cctx, cctx.first_parms_id)
    ca = np.asarray(cenc.encrypt(cencoder.encode([0.5, -1.0], 2.0 ** 25)).data)
    ck = np.stack([np.asarray(pk.data.data) for pk in crk.key(2)])
    cwant = np.asarray(jax.jit(build_ckks_mul_relin_rescale(cctx))(ca, ca, ck))

    cmesh = Mesh(np.asarray(devices[:4]), axis_names=("coeff",))
    csh = NamedSharding(cmesh, P(None, None, "coeff"))
    cksh = NamedSharding(cmesh, P(None, None, None, "coeff"))
    cout = np.asarray(ckks_mul_relin_rescale_coeff_sharded(
        jax.device_put(ca, csh), jax.device_put(ca, csh),
        jax.device_put(ck, cksh), cplan, cmesh,
    ))
    assert np.array_equal(cout, cwant)
    print("3) coefficient-sharded (all_to_all-only) deep-N step: bit-exact")
    print("ex10 OK — three explicit pod schedules, all bit-exact vs in-core")


if __name__ == "__main__":
    main()
