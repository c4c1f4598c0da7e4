"""Prototype: fused face-sweep kernel (traces + roll neighbors + Rusanov +
weighted transpose) for Euler on a periodic 3-D box, vs the XLA chain.

Layout experiment: state stored k-major [ne, neq, ndof] so the trace is a
single 2-D matmul per row; neighbors via shifted BlockSpec views.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = "--tpu" not in sys.argv
if INTERPRET:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from tps_tpu.dg.discretization import build_tables
from tps_tpu.mesh.generators import box_3d
from tps_tpu.physics.gas import DryAir

N = 16
P = 2
mix = DryAir(dim=3, nvel=3)
mesh = box_3d(N, N, N, periodic=(True, True, True))
tab = build_tables(mesh, order=P)
NDOF, NQF, NLF, NEQ = tab.ndof, tab.nqf, tab.nlf, 5
NE = tab.ne
GAM = 1.4

# local faces in generator order: x-(0?) figure from roll_info
grid, per_lf = tab.roll_info
print("roll info:", grid, per_lf)

Btr = jnp.asarray(tab.Btr, jnp.float32)          # [54, 27]
nor = jnp.asarray(tab.nor_slot[0], jnp.float32)   # [6, 9, 3] uniform mesh
wts = jnp.asarray(tab.wts_slot[0], jnp.float32)   # [6, 9]

rng = np.random.RandomState(0)
Up = np.zeros((NE, NDOF, NEQ), np.float32)
Up[..., 0] = 1.0 + 0.1 * rng.rand(NE, NDOF)
Up[..., 1:4] = 0.3 * rng.randn(NE, NDOF, 3)
Up[..., 4] = 10.0 + rng.rand(NE, NDOF)
U = np.array(Up)
U[..., 4] = Up[..., 4] / (GAM - 1) + 0.5 * (Up[..., 1:4] ** 2).sum(-1) / Up[..., 0]
U[..., 1:4] *= Up[..., 0:1]
Ustd = jnp.asarray(U)                      # [ne, ndof, neq]
Ukm = jnp.asarray(np.transpose(U.reshape(N, N, N, NDOF, NEQ), (0, 1, 2, 4, 3)))
# [nz, ny, nx, neq, ndof] k-major


def rusanov(U1, U2, n):
    """U*: [..., neq]; n [..., 3] scaled normals. Returns flux [..., neq]."""
    def flux(Uv):
        rho = Uv[..., 0]
        mom = Uv[..., 1:4]
        E = Uv[..., 4]
        vel = mom / rho[..., None]
        p = (GAM - 1) * (E - 0.5 * jnp.sum(mom * vel, -1))
        un = jnp.sum(vel * n, -1)
        F = jnp.concatenate([
            jnp.sum(mom * n, -1)[..., None],
            mom * un[..., None] + p[..., None] * n,
            ((E + p) * un)[..., None],
        ], -1)
        c = jnp.sqrt(GAM * p / rho) * jnp.linalg.norm(n, axis=-1)
        s = jnp.abs(un) + c
        return F, s
    F1, s1 = flux(U1)
    F2, s2 = flux(U2)
    s = jnp.maximum(s1, s2)
    return 0.5 * (F1 + F2) - 0.5 * s[..., None] * (U2 - U1)


# ---------------- XLA reference chain (the current slot+roll path) --------
@jax.jit
def xla_chain(Ux):
    tr = jnp.einsum("fd,ndk->nfk", Btr, Ux).reshape(NE, NLF, NQF, NEQ)
    og = tr.reshape(N, N, N, NLF, NQF, NEQ)
    nbr = jnp.stack([
        jnp.roll(og[..., opp, :, :], shift, axis=axis)
        for (axis, shift, opp) in per_lf
    ], axis=-3).reshape(NE, NLF, NQF, NEQ)
    own = tr
    f = rusanov(own, nbr, nor[None])
    z = jnp.einsum("fd,nfk->ndk", Btr,
                   (f * wts[None, ..., None]).reshape(NE, NLF * NQF, NEQ))
    return z


# ---------------- Pallas kernel -------------------------------------------
BtrT = jnp.asarray(tab.Btr.T, jnp.float32)  # [27, 54]
# neighbor face blocks: for lf, neighbor trace = own-trace rows of opp face
# of the shifted element


def kernel(btr_ref, nor_ref, wts_ref, uc, uzm, uzp, out):
    # slab tiles: block [1, ny, nx, NEQ, NDOF]; z neighbors from shifted
    # refs, x/y neighbors via in-slab slice+concat rolls
    BtrT = btr_ref[...]
    ny, nx = uc.shape[1], uc.shape[2]
    X2 = uc[0].reshape(ny * nx * NEQ, NDOF)

    def face_tr(X2d, lf):
        cols = BtrT[:, lf * NQF:(lf + 1) * NQF]
        t = jnp.dot(X2d, cols, preferred_element_type=jnp.float32)
        return jnp.transpose(t.reshape(ny * nx, NEQ, NQF), (0, 2, 1))

    def roll0(arr3, shift, period, stride):
        # roll of the leading (ny*nx) dim by shift*stride with wraparound
        # period*stride, via slice+concat (shift in {-1, +1})
        k = stride if shift == 1 else (period - 1) * stride
        # roll(x, s)[i] = x[i - s]: bring the last k rows to the front
        flat = arr3.reshape(period * stride, -1)
        rolled = jnp.concatenate([flat[-k:], flat[:-k]], axis=0)
        return rolled.reshape(arr3.shape)

    # shift s reads block k-s: +1 -> k-1 (uzm), -1 -> k+1 (uzp)
    refs = {(0, 1): uzm, (0, -1): uzp}
    acc = jnp.zeros((ny * nx * NEQ, NDOF), jnp.float32)
    for lf, (axis, shift, opp) in enumerate(per_lf):
        o = face_tr(X2, lf)                      # [ny*nx, nqf, neq]
        if axis == 2:  # x: roll within each row
            t = face_tr(X2, opp).reshape(ny, nx, NQF, NEQ)
            if shift == 1:
                t = jnp.concatenate([t[:, -1:], t[:, :-1]], axis=1)
            else:
                t = jnp.concatenate([t[:, 1:], t[:, :1]], axis=1)
            b = t.reshape(ny * nx, NQF, NEQ)
        elif axis == 1:  # y: roll whole rows within the slab
            t = face_tr(X2, opp).reshape(ny, nx, NQF, NEQ)
            if shift == 1:
                t = jnp.concatenate([t[-1:], t[:-1]], axis=0)
            else:
                t = jnp.concatenate([t[1:], t[:1]], axis=0)
            b = t.reshape(ny * nx, NQF, NEQ)
        else:
            Xn = refs[(axis, shift)][0].reshape(ny * nx * NEQ, NDOF)
            b = face_tr(Xn, opp)
        n_f = nor_ref[lf]
        w_f = wts_ref[lf]
        f = rusanov(o, b, n_f[None])
        fw = f * w_f[None, :, None]
        fw2 = jnp.transpose(fw, (0, 2, 1)).reshape(ny * nx * NEQ, NQF)
        acc = acc + jnp.dot(
            fw2, jnp.transpose(BtrT[:, lf * NQF:(lf + 1) * NQF]),
            preferred_element_type=jnp.float32,
        )
    out[0] = acc.reshape(ny, nx, NEQ, NDOF)


def pallas_chain(Uk):
    nz, ny, nx = N, N, N
    bs = (1, ny, nx, NEQ, NDOF)

    def mk(dz):
        return pl.BlockSpec(bs, lambda k, dz=dz: ((k + dz) % nz, 0, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    full = lambda a: pl.BlockSpec(a.shape, lambda k: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx, NEQ, NDOF), jnp.float32),
        grid=(nz,),
        in_specs=[full(BtrT), full(nor), full(wts),
                  mk(0), mk(-1), mk(1)],
        out_specs=pl.BlockSpec(bs, lambda k: (k, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(BtrT, nor, wts, Uk, Uk, Uk)


pallas_jit = jax.jit(pallas_chain)

z_ref = np.asarray(xla_chain(Ustd))
z_pal = np.asarray(pallas_jit(Ukm))
z_pal_std = np.transpose(z_pal.reshape(N, N, N, NEQ, NDOF), (0, 1, 2, 4, 3)).reshape(NE, NDOF, NEQ)
err = np.abs(z_pal_std - z_ref).max() / (np.abs(z_ref).max() + 1e-30)
print("rel err pallas vs xla:", err)
assert err < 1e-5, err
print("CORRECT")

if not INTERPRET:
    for name, fn, arg in [("xla", xla_chain, Ustd), ("pallas", pallas_jit, Ukm)]:
        r = fn(arg); r.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(50):
            r = fn(arg)
        r.block_until_ready()
        dt = (time.perf_counter() - t0) / 50
        print(f"{name}: {dt*1e3:.3f} ms")
