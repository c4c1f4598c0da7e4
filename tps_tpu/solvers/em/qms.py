"""Quasimagnetostatic EM solvers (frequency domain).

Axisymmetric A_theta formulation mirroring the reference
(reference: src/quasimagnetostatic.cpp:790-1400):

  block system  [ K          -w M_sigma ] [A_re]   [r]
                [ w M_sigma   K         ] [A_im] = [0]

  K        = (grad v, r grad A) + (v, A/r)           (:855-857)
  M_sigma  = (v, mu0 sigma 2 pi f  r A)              (:1014-1019)
  r        = (v, mu0 I/2 r) over coil-ring elements  (InitializeCurrent)
  A = 0 on the outer boundary; solved with preconditioned GMRES
  (the reference uses FGMRES + BoomerAMG; here diagonal-preconditioned
  jax GMRES on the matrix-free block operator).

Outputs: Joule heating q_J = 2 w^2 sigma (A_re^2 + A_im^2) (:1073-1086),
electric field E = i w A (:1088-1094), total Joule heating, coil current,
and magnetic energy for the power-control loop of the coupling driver.
"""

from __future__ import annotations

import numpy as np

from ...constants import PI
from ...fem import h1, krylov
from ..base import Solver, register_solver


def em_mesh_from_ini(inp):
    """Build the EM mesh from the [em] ini section: either an MFEM mesh
    file (em/mesh, reference: src/quasimagnetostatic.cpp reads the mesh
    named in em/mesh) or a generated box with coil-ring element
    attributes:

        [em]
        generator = box2d
        nx/ny, x0/x1/y0/y1      domain (r, z)
        ring1/center = r z      elements whose centroid lies within
        ring1/halfwidth = dr dz halfwidth of center get attribute 1+j
        ring2/... etc.

    Ring j gets element attribute 1+j, matching the reference's ring
    attribute convention (attrs 2..5 carry current)."""
    gen = inp.get("em/generator", None)
    if gen is None:
        from ...mesh.mfem_reader import read_mesh

        return read_mesh(inp.get_required("em/mesh"))
    if gen != "box2d":
        raise ValueError(f"unknown em mesh generator '{gen}'")
    from ...mesh.generators import box_2d

    mesh = box_2d(
        inp.get("em/nx", 16), inp.get("em/ny", 16),
        x0=inp.get("em/x0", 0.0), x1=inp.get("em/x1", 1.0),
        y0=inp.get("em/y0", 0.0), y1=inp.get("em/y1", 1.0),
    )
    cent = mesh.vertices[mesh.elements].mean(axis=1)
    attrs = np.ones(mesh.num_elements, dtype=np.int64)
    j = 1
    while True:
        if f"em/ring{j}/center" not in inp.values:
            break
        c = inp.get_vec(f"em/ring{j}/center", 2)
        hw = inp.get_vec(f"em/ring{j}/halfwidth", 2)
        inside = (np.abs(cent[:, 0] - c[0]) < hw[0]) & (
            np.abs(cent[:, 1] - c[1]) < hw[1]
        )
        attrs[inside] = 1 + j
        j += 1
    mesh.elem_attrs = attrs
    return mesh


class QuasiMagnetostaticSolverAxiSym(Solver):
    """Standalone axisymmetric EM solver ('em-axi' in the registry)."""

    def __init__(self, config, tps=None, mesh=None):
        super().__init__(config, tps)
        self._mesh_in = mesh

    def initialize(self):
        import jax
        import jax.numpy as jnp

        inp = self.config.raw if hasattr(self.config, "raw") else self.config
        self.dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

        if self._mesh_in is not None:
            self.mesh = self._mesh_in
        else:
            self.mesh = em_mesh_from_ini(inp)
        order = inp.get("em/order", 1)
        tab_np = h1.build_h1(self.mesh, order=order)
        self.tab = tab_np.to_jax(self.dtype)
        # element-sharded solve over a device mesh (em/partitions N): the
        # Krylov operator applies run under shard_map with psum assembly
        # (SURVEY 2.6: the reference runs the EM solve under MPI too)
        self.nparts = int(inp.get("em/partitions", 1) or 1)
        if self.nparts > 1:
            self.stab = h1.ShardedH1(
                tab_np, self.nparts, self.dtype,
                devices=getattr(self.config, "devices", None),
            )
        else:
            self.stab = self.tab

        self.mu0 = inp.get("em/mu0", 1.25663706e-6)
        self.current_amplitude = inp.get("em/current_amplitude", 1.0)
        self.current_frequency = inp.get("em/current_frequency", 1.0)
        self.rtol = inp.get("em/rtol", 1e-10)
        self.atol = inp.get("em/atol", 0.0)  # 0: pure relative (the rhs
        # scale here is mu0*J ~ 1e-7, so an absolute 1e-10 default
        # would stop solves at ~1e-3 relative)
        self.max_iter = inp.get("em/max_iter", 200)
        # background conductivity used ONLY in the preconditioner
        # (reference: em/preconditioner_background_sigma,
        # src/quasimagnetostatic.cpp:439-443)
        self.pre_bg_sigma = inp.get(
            "em/preconditioner_background_sigma", -1.0)
        top_only = bool(inp.get("em/top_only", 0))
        bot_only = bool(inp.get("em/bot_only", 0))

        # ring-current source by element attribute (attr 1 = no source;
        # attrs 2..5 = rings, reference InitializeCurrent)
        attrs = self.mesh.attributes()
        max_attr = int(attrs.max())
        J0 = np.zeros(max_attr + 1)
        mu0J = self.mu0 * self.current_amplitude * 0.5
        if max_attr >= 5:
            if bot_only:
                J0[2] = J0[3] = mu0J
            elif top_only:
                J0[4] = J0[5] = mu0J
            else:
                J0[2] = J0[3] = J0[4] = J0[5] = mu0J
        elif max_attr >= 2:
            J0[2:] = mu0J
        self._J0_attr = J0
        self._ring_attr = 2  # attr used for coilCurrent reporting

        # per-quad-point coefficient fields
        xq = self.tab.xyz_q
        self.r_q = xq[..., 0]
        self.inv_r_q = 1.0 / jnp.maximum(self.r_q, 1e-14)
        J0_q = jnp.asarray(J0)[jnp.asarray(attrs)][:, None] * jnp.ones_like(self.r_q)
        self.J0_q = J0_q

        # Dirichlet on all boundary (A=0): reference ess_bdr on exterior
        bdofs = h1.boundary_dofs(self.tab)
        self.mask = jnp.ones(self.tab.ndofs).at[jnp.asarray(bdofs)].set(0.0)

        # plasma conductivity field (set by the coupling driver)
        self.plasma_conductivity = jnp.zeros(self.tab.ndofs, self.dtype)
        self.A_re = jnp.zeros(self.tab.ndofs, self.dtype)
        self.A_im = jnp.zeros(self.tab.ndofs, self.dtype)
        self.joule_heating = jnp.zeros(self.tab.ndofs, self.dtype)

        self.iter = 0
        self.time = 0.0

    @property
    def max_iters(self):
        return 1

    # ------------------------------------------------------------------
    def set_plasma_conductivity(self, sigma):
        import jax.numpy as jnp

        self.plasma_conductivity = jnp.asarray(sigma, self.dtype)

    def _K_apply(self, tab, v, r_q=None, inv_r_q=None):
        return h1.diffusion_apply(
            tab, v, self.r_q if r_q is None else r_q
        ) + h1.mass_apply(tab, v, self.inv_r_q if inv_r_q is None else inv_r_q)

    def _solve_core(self, sigma, J0_q):
        """One frequency-domain solve from (sigma nodal, J0 at quad pts).
        Pure function of its arguments (jitted once and cached — an eager
        gmres call would re-trace and re-compile the whole Krylov loop on
        EVERY coupled EM solve).

        Full f32 matmuls throughout: the TPU default (bf16 products)
        floors the achievable TRUE residual of this mu0-scaled system
        at ~1e-1, where full-f32 dense algebra reaches ~2e-6 (measured,
        PERF.md round 4)."""
        import jax
        import jax.numpy as jnp

        with jax.default_matmul_precision("highest"):
            return self._solve_core_impl(sigma, J0_q)

    def _solve_core_impl(self, sigma, J0_q):
        import jax
        import jax.numpy as jnp

        tab = self.tab
        omega = 2.0 * PI * self.current_frequency
        mu0_omega = self.mu0 * omega

        # sigma at quad points (nodal field; computed on the global tables,
        # coefficients stacked per shard when the solve is element-sharded)
        sig_q = jnp.einsum("qd,nd->nq", tab.Bvol, h1.gather(tab, sigma))
        msw_q = mu0_omega * sig_q * self.r_q

        stab = self.stab
        sharded = stab is not self.tab
        wrap = stab.stack_quad if sharded else (lambda c: c)
        r_qs, inv_r_qs, msw_qs = wrap(self.r_q), wrap(self.inv_r_q), wrap(msw_q)

        mask = self.mask
        nd = tab.ndofs

        def block_apply(w):
            a_re, a_im = w[:nd], w[nd:]
            a_re = a_re * mask
            a_im = a_im * mask
            y_re = self._K_apply(stab, a_re, r_qs, inv_r_qs) \
                - h1.mass_apply(stab, a_im, msw_qs)
            y_im = h1.mass_apply(stab, a_re, msw_qs) \
                + self._K_apply(stab, a_im, r_qs, inv_r_qs)
            y_re = y_re * mask + w[:nd] * (1 - mask)
            y_im = y_im * mask + w[nd:] * (1 - mask)
            return jnp.concatenate([y_re, y_im])

        # rhs: (v, J0 r) on the real block
        rhs_re = h1.mass_apply(stab, jnp.ones(nd, self.dtype),
                               wrap(J0_q * self.r_q))
        b = jnp.concatenate([rhs_re * mask, jnp.zeros(nd, self.dtype)])

        # -- dense Schur-complement direct solve (small unsharded
        # spaces).  The f32 Krylov TRUE residual floors near 1e-1 on
        # this mu0-scaled block system (kappa ~ 1/eps_f32; the old
        # jax.scipy gmres reported its drifting |g| estimate of 3e-5
        # while the true residual was 0.13 — PERF.md round 4), and on
        # the hosted TPU dense MXU factorizations beat matrix-free
        # iteration anyway (round-3 loMach lesson).  Eliminating
        # a_im = -K^-1 M a_re gives the SPD Schur system
        # (K + M K^-1 M) a_re = b_re: two robust Cholesky factors +
        # matrix-free iterative-refinement steps for accuracy.
        if not sharded and h1.dense_capable(tab):
            Ke = h1.element_stiffness(tab, r_qs) + h1.element_mass(
                tab, inv_r_qs)
            Kd = h1.dense_constrain(h1.assemble_dense(tab, Ke), mask)
            Mm = h1.assemble_dense(tab, h1.element_mass(tab, msw_qs))
            Mm = Mm * (mask[:, None] * mask[None, :])
            Kinv = h1.direct_precond(h1.dense_cholesky(Kd))
            X = Kinv(Mm)  # K^-1 M  [nd, nd]
            S = Kd + Mm @ X
            Sinv = h1.direct_precond(h1.dense_cholesky(S))

            def schur_solve(r_re, r_im):
                t = Kinv(r_im)
                a_re = Sinv(r_re + Mm @ t)
                return a_re, t - X @ a_re

            a_re, a_im = schur_solve(b[:nd], jnp.zeros(nd, self.dtype))
            # iterative refinement with the matrix-free residual: each
            # step multiplies the error by the factorization's backward
            # error (~1e-5 in f32), so 2 steps reach the f32 floor
            for _ in range(2):
                w = jnp.concatenate([a_re, a_im])
                r = b - block_apply(w)
                d_re, d_im = schur_solve(r[:nd], r[nd:])
                a_re = a_re + d_re
                a_im = a_im + d_im
            w = jnp.concatenate([a_re, a_im])
            res = jnp.linalg.norm(b - block_apply(w))
            relres = res / jnp.maximum(jnp.linalg.norm(b), 1e-300)
            a_re = a_re * mask
            a_im = a_im * mask
            joule = 2.0 * omega**2 * sigma * (a_re**2 + a_im**2)
            return a_re, a_im, joule, jnp.asarray(3), relres

        # diagonal preconditioner from K's diagonal (+ optional
        # background-sigma mass term, reference
        # src/quasimagnetostatic.cpp:439-443)
        kdiag = h1.stiffness_diag(stab, r_qs) + h1.mass_lumped_diag(
            stab, inv_r_qs
        )
        if self.pre_bg_sigma > 0:
            kdiag = kdiag + h1.mass_lumped_diag(
                stab, wrap(mu0_omega * self.pre_bg_sigma * self.r_q))
        kdiag = kdiag * mask + (1 - mask)
        dinv = 1.0 / jnp.concatenate([kdiag, kdiag])

        # GMRES-IR: f64 outer (true-residual restarts) + f32 Arnoldi
        # cycles — TPU runs f64 by software emulation, so the cycles
        # (all the matvecs) go at native f32 speed while accuracy comes
        # from the outer refresh (fem/krylov.py)
        cyc = {}
        if self.dtype == jnp.float64:
            f32 = jnp.float32

            def _cast(a):
                return (a.astype(f32)
                        if hasattr(a, "dtype")
                        and jnp.issubdtype(a.dtype, jnp.floating) else a)

            stab32 = jax.tree.map(_cast, stab)
            r32, ir32, msw32 = _cast(r_qs), _cast(inv_r_qs), _cast(msw_qs)
            mask32, dinv32 = _cast(mask), _cast(dinv)

            def block_apply32(w32):
                a_re = w32[:nd] * mask32
                a_im = w32[nd:] * mask32
                y_re = self._K_apply(stab32, a_re, r32, ir32) \
                    - h1.mass_apply(stab32, a_im, msw32)
                y_im = h1.mass_apply(stab32, a_re, msw32) \
                    + self._K_apply(stab32, a_im, r32, ir32)
                y_re = y_re * mask32 + w32[:nd] * (1 - mask32)
                y_im = y_im * mask32 + w32[nd:] * (1 - mask32)
                return jnp.concatenate([y_re, y_im])

            cyc = dict(cycle_dtype=f32, cycle_apply=block_apply32,
                       cycle_M=lambda v: v * dinv32)

        w, kiters, krelres = krylov.gmres_solve(
            block_apply, b, tol=self.rtol, atol=self.atol,
            maxiter=self.max_iter,
            M=lambda x: x * dinv, restart=30, return_info=True, **cyc,
        )
        A_re = w[:nd] * mask
        A_im = w[nd:] * mask

        # Joule heating q_J = 2 w^2 sigma |A|^2 (reference :1073-1086)
        joule = 2.0 * omega**2 * sigma * (A_re**2 + A_im**2)
        return A_re, A_im, joule, kiters, krelres

    def solve_step(self):
        import time as _time

        import jax

        if getattr(self, "_solve_jit", None) is None:
            self._solve_jit = jax.jit(self._solve_core)
        t0 = _time.perf_counter()
        self.A_re, self.A_im, self.joule_heating, kiters, krelres = \
            self._solve_jit(self.plasma_conductivity, self.J0_q)
        jax.block_until_ready(self.A_re)
        # per-solve cost diagnostics (reference prints hypre iteration
        # counts/residuals per EM solve, src/quasimagnetostatic.cpp:464-476)
        self.last_solve_ms = 1e3 * (_time.perf_counter() - t0)
        self.last_solve_iters = int(kiters)
        self.last_solve_relres = float(krelres)
        self.iter += 1

    def solve(self):
        self.solve_step()

    # -- diagnostics (reference :1186-1380) --------------------------------
    def electric_field(self):
        """E_theta = i w A: returns (E_re, E_im)."""
        omega = 2.0 * PI * self.current_frequency
        return -omega * self.A_im, omega * self.A_re

    def _diag_core(self, A_re, A_im, joule):
        """One jitted pass for the per-solve diagnostics (total Joule
        heating + magnetic energy): the eager per-op chains cost
        ~35-430 ms per call through the hosted-TPU relay (round-5
        profile of the coupled-torch EM boundary); jitted + fetched as
        one [2]-vector they cost one round trip."""
        import jax.numpy as jnp

        tab = self.tab
        w = tab.wq[None, :] * tab.detJ
        jq = jnp.einsum("qd,nd->nq", tab.Bvol,
                        h1.gather(tab, joule))
        tot_jh = jnp.sum(w * jq * self.r_q)
        emag = 0.0
        for A in (A_re, A_im):
            g = h1.grad_at_dofs(tab, A)  # [nd, (r,z)]
            gq = jnp.einsum("qd,ndi->nqi", tab.Bvol, h1.gather(tab, g))
            Aq = jnp.einsum("qd,nd->nq", tab.Bvol, h1.gather(tab, A))
            Br = -gq[..., 1]
            Bz = gq[..., 0] + Aq * self.inv_r_q
            emag = emag + jnp.sum(w * (Br**2 + Bz**2) * self.r_q)
        return jnp.stack([tot_jh, PI / self.mu0 * 0.5 * emag])

    def _diag_vals(self):
        """(total_joule, magnetic_energy) computed once per EM solve and
        per joule scaling; one host materialization for both."""
        import jax

        key = (self.iter, getattr(self, "_joule_version", 0))
        if getattr(self, "_diag_key", None) != key:
            if getattr(self, "_diag_jit", None) is None:
                self._diag_jit = jax.jit(self._diag_core)
            self._diag_cache = np.asarray(self._diag_jit(
                self.A_re, self.A_im, self.joule_heating))
            self._diag_key = key
        return self._diag_cache

    def total_joule_heating(self):
        """int q_J r dr dz (reference totalJouleHeating, elementJouleHeating
        integrates jh * radius)."""
        return float(self._diag_vals()[0])

    def coil_current(self):
        """Area integral of I/2 over one ring (reference coilCurrent).
        Geometry-constant: computed once and cached."""
        import jax.numpy as jnp

        if getattr(self, "_coil_current", None) is None:
            tab = self.tab
            attrs = np.asarray(self.mesh.attributes())
            sel = jnp.asarray((attrs == self._ring_attr).astype(np.float64))
            val = 0.5 * self.current_amplitude
            self._coil_current = float(
                jnp.sum(tab.wq[None, :] * tab.detJ * sel[:, None]) * val
            )
        return self._coil_current

    def magnetic_energy(self):
        """(pi/mu0) int [ (dA/dz)^2 + (1/r d(rA)/dr)^2 ] r dr dz over both
        phase components (time-averaged magnetic energy)."""
        return float(self._diag_vals()[1])

    def scale_joule_heating(self, factor):
        self.joule_heating = self.joule_heating * factor
        self._joule_version = getattr(self, "_joule_version", 0) + 1


@register_solver("em-axi")
class _EmAxiFromConfig(QuasiMagnetostaticSolverAxiSym):
    pass
