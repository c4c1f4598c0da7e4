"""3-D quasimagnetostatic solver on H(curl) Nedelec elements.

The role of the reference QuasiMagnetostaticSolver3D
(src/quasimagnetostatic.cpp:134-660): frequency-domain vector potential
  curl (1/mu0) curl A + i sigma omega A = J_coil
with PEC boundary (A x n = 0, edge dofs zeroed), divergence-free coil
current projection (H1 Poisson solve), complex system solved as a 2x2 real
block GMRES, B = curl A, cycle-averaged Joule heating
q_J = 2 omega^2 sigma |A|^2 matching the axisymmetric solver convention.
"""

from __future__ import annotations

import numpy as np

from ...constants import PI
from ...fem import h1, hcurl, krylov
from ..base import Solver, register_solver

MU0 = 4.0e-7 * PI


class QuasiMagnetostatic3D(Solver):
    def __init__(self, mesh, coils=(), current_frequency=6.0e6,
                 current_amplitude=2.0e6, rtol=1e-8, max_iter=600,
                 quad_order=3, attr_currents=None, current_axis=(0.0, 1.0, 0.0),
                 mu0=MU0, preconditioner="auto", partitions=1, devices=None,
                 order=1, atol=0.0, preconditioner_background_sigma=-1.0):
        """coils: tuple of rings (z0, r1, r2, half_height) carrying the
        azimuthal (about the z axis) source current density.

        attr_currents: optional {volume attribute: current density} map --
        the reference's ring definition, where coil rings are volume
        attributes of the EM mesh carrying uniform azimuthal current about
        `current_axis` (reference InitializeCurrent,
        src/quasimagnetostatic.cpp:227-279 and JFun :740-749)."""
        import jax.numpy as jnp

        # Solver-lifecycle attributes (this class takes a mesh, not a
        # RunConfiguration, so it does not chain to Solver.__init__)
        self.config = None
        self.tps = None
        self.status = 0
        self.time = 0.0

        self.mesh = mesh
        self.coils = tuple(coils)
        self.attr_currents = dict(attr_currents) if attr_currents else {}
        self.current_axis = np.asarray(current_axis, dtype=np.float64)
        self.mu0 = float(mu0)
        self.current_frequency = current_frequency
        self.current_amplitude = current_amplitude
        self.rtol = rtol
        self.atol = atol
        self.max_iter = max_iter
        # background conductivity used ONLY in the preconditioner
        # (reference: em/preconditioner_background_sigma,
        # src/quasimagnetostatic.cpp:439-443)
        self.pre_bg_sigma = float(preconditioner_background_sigma)
        self.preconditioner = preconditioner
        self.dtype = jnp.float64

        self.order = int(order)
        tab_np = hcurl.build_hcurl(mesh, quad_order=quad_order,
                                   order=self.order)
        self.tab = tab_np.to_jax(self.dtype)
        self.h1tab = h1.build_h1(mesh, order=1).to_jax(self.dtype)
        # element-sharded assembly over a device mesh (em/partitions N):
        # the Krylov operator applies run under shard_map with psum
        # assembly (reference: the EM solve runs under MPI too)
        self.nparts = max(int(partitions or 1), 1)
        if self.nparts > 1:
            self.stab = hcurl.ShardedHCurl(
                tab_np, self.nparts, self.dtype, devices=devices)
        else:
            self.stab = self.tab

        nedge = self.tab.nedge
        mask = np.ones(nedge)
        mask[np.asarray(self.tab.bdr_edges)] = 0.0  # PEC
        self.mask = jnp.asarray(mask)

        self.A_re = jnp.zeros(nedge)
        self.A_im = jnp.zeros(nedge)
        self.plasma_conductivity_q = jnp.zeros(self.tab.detJ.shape)
        # sigma also kept at the H1 quadrature points (AMS aux solves)
        self.plasma_conductivity_h1q = jnp.zeros(self.h1tab.detJ.shape)
        self.iter = 0

        self._Jq = self._coil_current_density()

    # -- source -----------------------------------------------------------
    def _geom_basis_at_hcurl_q(self):
        """Vertex (geometry) basis evaluated at the H(curl) quadrature
        reference points [nq_hc, nverts] — the H1 and H(curl) tables use
        different quadrature rules (tet simplex rule vs tensor GL), so
        nodal fields are interpolated onto the H(curl) points explicitly."""
        if getattr(self, "_Nvq", None) is None:
            from ...mesh.reference_element import ReferenceElement

            ref = ReferenceElement(geom=self.mesh.geom, order=1,
                                   basis="gauss-lobatto")
            self._Nvq = ref.eval_geom_basis(np.asarray(self.tab.ref_pts))
        return self._Nvq

    def _coil_current_density(self):
        """Azimuthal ring current density at quadrature points, with a
        discrete divergence-free projection (reference InitializeCurrent +
        DivergenceFreeProjector, src/quasimagnetostatic.cpp:227-330)."""
        import jax.numpy as jnp

        Jq_hc = self._raw_current_at(self.tab.xyz_q)
        Jq_h1 = self._raw_current_at(self.h1tab.xyz_q)

        # divergence-free projection: J <- J - grad(phi), lap(phi) = div(J)
        # (pure Neumann; orthogonalized against constants)
        ht = self.h1tab
        divJ = self._div_at_dofs(Jq_h1)
        rhs = -h1.mass_apply(ht, divJ)
        rhs = rhs - jnp.mean(rhs)

        def lap(v):
            return h1.diffusion_apply(ht, v)

        diag = h1.stiffness_diag(ht) + 1e-30
        phi = h1.cg_solve(lap, rhs, x0=jnp.zeros(ht.ndofs), diag=diag,
                          tol=1e-10, maxiter=400)
        gphi = jnp.stack(
            [h1.grad_at_dofs(ht, phi)[:, d] for d in range(3)], axis=-1
        )
        # grad(phi) at the H(curl) quadrature points via the vertex map
        v2d = self._vert2dof()
        Nvq = jnp.asarray(self._geom_basis_at_hcurl_q())
        gv = gphi[jnp.asarray(v2d)][jnp.asarray(self.mesh.elements)]
        gq = jnp.einsum("qv,nvk->nqk", Nvq, gv)
        return Jq_hc - gq

    def _raw_current_at(self, xyz):
        """Analytic ring/coil current density at arbitrary points
        [ne, nq, 3]."""
        import jax.numpy as jnp

        r = jnp.sqrt(xyz[..., 0] ** 2 + xyz[..., 1] ** 2)
        Jq = jnp.zeros_like(xyz)

        if self.attr_currents:
            # attribute-defined rings: uniform |J| per volume attribute,
            # azimuthal about current_axis (reference JFun: J = axis x x,
            # normalized; src/quasimagnetostatic.cpp:740-749)
            attrs = np.asarray(self.mesh.attributes())
            amp = np.zeros(int(attrs.max()) + 1)
            for a, j0 in self.attr_currents.items():
                amp[int(a)] = float(j0)
            amp_e = jnp.asarray(amp[attrs])  # [ne]
            ax = jnp.asarray(self.current_axis)
            axx = jnp.cross(jnp.broadcast_to(ax, xyz.shape), xyz)
            nrm = jnp.linalg.norm(axx, axis=-1, keepdims=True)
            ephi = axx / jnp.maximum(nrm, 1e-30)
            Jq = Jq + amp_e[:, None, None] * ephi

        for (z0, r1, r2, hh) in self.coils:
            inside = ((r >= r1) & (r <= r2)
                      & (jnp.abs(xyz[..., 2] - z0) <= hh))
            # unit azimuthal direction (-y/r, x/r, 0)
            rs = jnp.maximum(r, 1e-12)
            ephi = jnp.stack(
                [-xyz[..., 1] / rs, xyz[..., 0] / rs, jnp.zeros_like(rs)],
                axis=-1,
            )
            area = (r2 - r1) * 2.0 * hh
            Jq = Jq + jnp.where(
                inside[..., None], self.current_amplitude / area * ephi, 0.0
            )
        return Jq

    def _div_at_dofs(self, Fq):
        """Weak divergence of a quad-point vector field onto H1 dofs."""
        import jax.numpy as jnp

        ht = self.h1tab
        # int grad(w) . F = -int w div F (Neumann): nodal div via lumped mass
        Fk = jnp.einsum("nqkd,nqd->nqk", ht.adjJ, Fq)
        z = jnp.einsum("q,qik,nqk->ni", ht.wq, ht.Gvol, Fk)
        out = h1.scatter_add(ht, z)
        return -out / h1.mass_lumped_diag(ht)

    # -- coupling interface ------------------------------------------------
    def set_plasma_conductivity(self, sigma_nodal):
        """sigma given at H1 nodes; stored at the H(curl) quadrature
        points (interpolated through the vertex basis — the H1 and
        H(curl) quadrature rules differ on tet meshes)."""
        import jax.numpy as jnp

        v2d = self._vert2dof()
        Nvq = jnp.asarray(self._geom_basis_at_hcurl_q())
        sv = jnp.asarray(sigma_nodal)[jnp.asarray(v2d)][
            jnp.asarray(self.mesh.elements)]
        self.plasma_conductivity_q = jnp.einsum("qv,nv->nq", Nvq, sv)
        ht = self.h1tab
        self.plasma_conductivity_h1q = jnp.einsum(
            "qd,nd->nq", ht.Bvol, h1.gather(ht, jnp.asarray(sigma_nodal))
        )

    def initialize(self):
        pass

    @property
    def max_iters(self):
        return 1

    def _vert2dof(self):
        """Mesh-vertex id -> order-1 H1 dof id (coordinate matching; the
        H1 numbering is coordinate-based, not vertex-based)."""
        if getattr(self, "_v2d", None) is not None:
            return self._v2d
        verts = np.asarray(self.mesh.vertices)
        dofx = np.asarray(self.h1tab.xyz)
        scale = max(np.abs(verts).max(), 1.0)

        def key(a):
            return [tuple(r) for r in
                    np.round(a / scale * 1e10).astype(np.int64)]

        lookup = {k: i for i, k in enumerate(key(dofx))}
        self._v2d = np.array([lookup[k] for k in key(verts)], dtype=np.int64)
        return self._v2d

    def _ams_precond(self, msw_h1q, eps_reg, kdiag):
        """Auxiliary-space (AMS-class) preconditioner for the SPD part
        K + (eps + w mu0 sigma) M (reference: HypreAMS,
        src/quasimagnetostatic.cpp:449). Additive three-term form:

          P^-1 = D^-1  +  G L_grad^-1 G^T  +  Pi L_vec^-1 Pi^T

        where G is the discrete gradient (edge e: phi[hi]-phi[lo]),
        L_grad = G^T A G = H1 stiffness with coefficient (eps + w mu0
        sigma) (curl G = 0 kills the curl term), Pi is the nodal
        vector-field interpolation onto edges, and L_vec the nodal vector
        analog (Laplacian + coefficient mass). Both auxiliary solves are
        Chebyshev-smoothed (linear, so GMRES stays valid)."""
        import jax.numpy as jnp
        from jax.ops import segment_sum

        tab, ht = self.tab, self.h1tab
        if tab.edge_verts is None:
            return self._ams_precond_ho(msw_h1q, eps_reg, kdiag)
        v2d = self._vert2dof()
        ev = np.asarray(tab.edge_verts)
        lo = jnp.asarray(v2d[ev[:, 0]])
        hi = jnp.asarray(v2d[ev[:, 1]])
        tvec = jnp.asarray(
            np.asarray(self.mesh.vertices)[ev[:, 1]]
            - np.asarray(self.mesh.vertices)[ev[:, 0]]
        )  # [nedge, 3] edge tangents (lo -> hi)
        emask = self.mask
        nh = ht.ndofs
        vfree = np.ones(nh)
        vfree[h1.boundary_dofs(ht)] = 0.0
        vmask = jnp.asarray(vfree)

        coef = eps_reg + msw_h1q  # [ne, nq_h1]

        def Lg(v):
            return h1.diffusion_apply(ht, v * vmask, coef) * vmask \
                + v * (1 - vmask)

        Lg_diag = h1.stiffness_diag(ht, coef) * vmask + (1 - vmask)
        Mg = h1.chebyshev_precond(Lg, Lg_diag, degree=4)

        def Lv(v):
            return (h1.diffusion_apply(ht, v * vmask)
                    + h1.mass_apply(ht, v * vmask, coef)) * vmask \
                + v * (1 - vmask)

        Lv_diag = (h1.stiffness_diag(ht)
                   + h1.mass_lumped_diag(ht, coef)) * vmask + (1 - vmask)
        Mv = h1.chebyshev_precond(Lv, Lv_diag, degree=4)

        def Minv_block(r0):
            r = r0 * emask
            z = r / kdiag
            # gradient-space correction
            rg = (segment_sum(r, hi, num_segments=nh)
                  - segment_sum(r, lo, num_segments=nh)) * vmask
            zg = Mg(rg)
            z = z + (zg[hi] - zg[lo])
            # vector-nodal correction (Pi = endpoint-average . tangent)
            for d in range(3):
                rv = 0.5 * (
                    segment_sum(r * tvec[:, d], hi, num_segments=nh)
                    + segment_sum(r * tvec[:, d], lo, num_segments=nh)
                ) * vmask
                zv = Mv(rv)
                z = z + 0.5 * (zv[hi] + zv[lo]) * tvec[:, d]
            # identity on constrained (PEC) edges: a zero there makes the
            # preconditioner singular and derails GMRES
            return z * emask + r0 * (1 - emask)

        return Minv_block

    def _ams_precond_ho(self, msw_h1q, eps_reg, kdiag):
        """Auxiliary-space preconditioner for order >= 2 Nedelec: the
        discrete gradient and nodal interpolation act through the
        per-element interpolatory blocks (Gref, tau_dof) instead of the
        Whitney edge-endpoint incidence.  Interpolation-consistent
        assembly: shared dofs are averaged over their (element, local)
        copies (dof_mult); the adjoints use the matching 1/mult gather."""
        import jax.numpy as jnp
        from jax.ops import segment_sum

        tab, ht = self.tab, self.h1tab
        v2d = self._vert2dof()
        ev_dofs = jnp.asarray(v2d[np.asarray(self.mesh.elements)])  # [ne, nv]
        ed = jnp.asarray(tab.elem_edges)  # [ne, ndloc]
        sg = jnp.asarray(tab.edge_sign)
        # Gref: [ndloc, nv] fixed reference block (hex: dof directions are
        # reference axes) or [ne, ndloc, nv] per-element (tet: canonical
        # tangents pulled back through the affine J)
        Gref = jnp.asarray(tab.Gref)
        per_elem_G = Gref.ndim == 3
        tau = jnp.asarray(tab.tau_dof)  # [ne, ndloc, 3]
        mult = jnp.asarray(tab.dof_mult)
        Pref = jnp.asarray(self._geo_basis_at_dof_pts())  # [ndloc, nv]

        emask = self.mask
        nh = ht.ndofs
        ndof = tab.nedge
        vfree = np.ones(nh)
        vfree[h1.boundary_dofs(ht)] = 0.0
        vmask = jnp.asarray(vfree)

        coef = eps_reg + msw_h1q

        def Lg(v):
            return h1.diffusion_apply(ht, v * vmask, coef) * vmask \
                + v * (1 - vmask)

        Lg_diag = h1.stiffness_diag(ht, coef) * vmask + (1 - vmask)
        Mg = h1.chebyshev_precond(Lg, Lg_diag, degree=4)

        def Lv(v):
            return (h1.diffusion_apply(ht, v * vmask)
                    + h1.mass_apply(ht, v * vmask, coef)) * vmask \
                + v * (1 - vmask)

        Lv_diag = (h1.stiffness_diag(ht)
                   + h1.mass_lumped_diag(ht, coef)) * vmask + (1 - vmask)
        Mv = h1.chebyshev_precond(Lv, Lv_diag, degree=4)

        def G_apply(p):
            if per_elem_G:
                gl = jnp.einsum("nv,ndv->nd", p[ev_dofs], Gref) * sg
            else:
                gl = (p[ev_dofs] @ Gref.T) * sg  # [ne, ndloc]
            return segment_sum(gl.reshape(-1), ed.reshape(-1),
                               num_segments=ndof) / mult

        def GT_apply(r):
            rl = (r / mult)[ed] * sg
            if per_elem_G:
                rv = jnp.einsum("nd,ndv->nv", rl, Gref)
            else:
                rv = rl @ Gref  # [ne, nv]
            return segment_sum(rv.reshape(-1), ev_dofs.reshape(-1),
                               num_segments=nh)

        def Pi_apply(u):  # u [nh, 3]
            u_at = jnp.einsum("dv,nvi->ndi", Pref, u[ev_dofs])
            val = jnp.einsum("ndi,ndi->nd", u_at, tau) * sg
            return segment_sum(val.reshape(-1), ed.reshape(-1),
                               num_segments=ndof) / mult

        def PiT_apply(r):
            rl = (r / mult)[ed] * sg  # [ne, ndloc]
            contrib = jnp.einsum("nd,dv,ndi->nvi", rl, Pref, tau)
            return segment_sum(
                contrib.reshape(-1, 3), ev_dofs.reshape(-1),
                num_segments=nh,
            )

        def Minv_block(r0):
            r = r0 * emask
            z = r / kdiag
            zg = Mg(GT_apply(r) * vmask)
            z = z + G_apply(zg)
            rv = PiT_apply(r) * vmask[:, None]
            zv = jnp.stack([Mv(rv[:, d]) for d in range(3)], axis=-1)
            z = z + Pi_apply(zv * vmask[:, None])
            return z * emask + r0 * (1 - emask)

        return Minv_block

    def _geo_basis_at_dof_pts(self):
        """Vertex (geometry) basis at the Nedelec dof nodes [ndloc, nv]."""
        if getattr(self, "_Nvd", None) is None:
            from ...mesh.reference_element import ReferenceElement

            ref = ReferenceElement(geom=self.mesh.geom, order=1,
                                   basis="gauss-lobatto")
            self._Nvd = ref.eval_geom_basis(np.asarray(self.tab.ref_dof_pts))
        return self._Nvd

    def solve_step(self):
        import time as _time

        import jax

        if getattr(self, "_solve_jit", None) is None:
            self._solve_jit = jax.jit(self._solve_core)
        t0 = _time.perf_counter()
        self.A_re, self.A_im, kiters, krelres = self._solve_jit(
            self._Jq, self.plasma_conductivity_q,
            self.plasma_conductivity_h1q,
        )
        jax.block_until_ready(self.A_re)
        # per-solve cost diagnostics (reference prints hypre iteration
        # counts/residuals per EM solve, src/quasimagnetostatic.cpp:464-476)
        self.last_solve_ms = 1e3 * (_time.perf_counter() - t0)
        self.last_solve_iters = int(kiters)
        self.last_solve_relres = float(krelres)
        self.iter += 1

    def _solve_core(self, Jq, sigma_q, sigma_h1q):
        """One frequency-domain block solve as a pure jitted function of
        (source current, conductivity at H(curl)/H1 quad points).  An
        eager gmres re-traces and re-compiles the Krylov loop on every
        coupled EM solve.

        Full f32 matmuls: the TPU bf16 default floors the achievable
        residual (see QuasiMagnetostaticSolverAxiSym._solve_core)."""
        import jax
        import jax.numpy as jnp

        with jax.default_matmul_precision("highest"):
            return self._solve_core_impl(Jq, sigma_q, sigma_h1q)

    def _solve_core_impl(self, Jq, sigma_q, sigma_h1q):
        import jax
        import jax.numpy as jnp

        tab = self.stab  # sharded assembly tables (== self.tab unsharded)
        omega = 2.0 * PI * self.current_frequency
        msw_q = self.mu0 * omega * sigma_q
        mask = self.mask
        nd = tab.nedge

        # small mass regularization lifts the curl-curl gradient nullspace
        # (the divergence-free projected RHS keeps gradient components out
        # of the solution)
        kd = hcurl.curlcurl_diag(tab)
        md = hcurl.mass_diag(tab)
        # device scalar (a float() here would sync the host per solve and
        # break the jitted trace)
        eps_reg = 1e-6 * jnp.sum(kd) / jnp.sum(md)

        def block_apply(w):
            a_re = w[:nd] * mask
            a_im = w[nd:] * mask
            k_re = hcurl.curlcurl_apply(tab, a_re) + eps_reg * hcurl.mass_apply(tab, a_re)
            k_im = hcurl.curlcurl_apply(tab, a_im) + eps_reg * hcurl.mass_apply(tab, a_im)
            y_re = k_re - hcurl.mass_apply(tab, a_im, msw_q)
            y_im = hcurl.mass_apply(tab, a_re, msw_q) + k_im
            y_re = y_re * mask + w[:nd] * (1 - mask)
            y_im = y_im * mask + w[nd:] * (1 - mask)
            return jnp.concatenate([y_re, y_im])

        msw_bg = self.mu0 * omega * max(self.pre_bg_sigma, 0.0)
        kdiag = kd + (eps_reg + msw_bg) * md + hcurl.mass_diag(tab, msw_q)
        kdiag = kdiag * mask + (1 - mask)

        b_re = self.mu0 * hcurl.rhs_vector(tab, Jq)
        b = jnp.concatenate([b_re * mask, jnp.zeros(nd, self.dtype)])

        # dense Schur-complement direct solve for small unsharded edge
        # spaces (same construction as the axisym solver; this also
        # sidesteps the AMS preconditioner's slow convergence at high
        # order — measured: AMS-GMRES stalls at 0.059 after 80 true
        # iterations on the order-2 tet coil where the direct solve is
        # exact).  K = curlcurl + eps*mass constrained SPD; eliminate
        # a_im = -K^-1 M a_re -> S = K + M K^-1 M.
        if (self.stab is self.tab
                and self.preconditioner in ("auto", "direct")
                and nd <= h1.DENSE_DIRECT_MAX):
            Ke = hcurl.element_curlcurl(tab) \
                + eps_reg * hcurl.element_mass(tab)
            Kd = hcurl.assemble_dense(tab, Ke)
            Kd = Kd * (mask[:, None] * mask[None, :])
            Kd = Kd + jnp.diag(1.0 - mask)
            Mm = hcurl.assemble_dense(tab, hcurl.element_mass(tab, msw_q))
            Mm = Mm * (mask[:, None] * mask[None, :])
            Kinv = h1.direct_precond(h1.dense_cholesky(Kd))
            X = Kinv(Mm)
            S = Kd + Mm @ X
            Sinv = h1.direct_precond(h1.dense_cholesky(S))

            def schur_solve(r_re, r_im):
                t = Kinv(r_im)
                a_re = Sinv(r_re + Mm @ t)
                return a_re, t - X @ a_re

            a_re, a_im = schur_solve(b[:nd], jnp.zeros(nd, self.dtype))
            for _ in range(2):  # matrix-free iterative refinement
                w = jnp.concatenate([a_re, a_im])
                r = b - block_apply(w)
                d_re, d_im = schur_solve(r[:nd], r[nd:])
                a_re = a_re + d_re
                a_im = a_im + d_im
            w = jnp.concatenate([a_re, a_im])
            res = jnp.linalg.norm(b - block_apply(w))
            relres = res / jnp.maximum(jnp.linalg.norm(b), 1e-300)
            return a_re * mask, a_im * mask, jnp.asarray(3), relres

        if self.preconditioner in ("ams", "auto"):
            msw_h1q = self.mu0 * omega * sigma_h1q + msw_bg
            Mb = self._ams_precond(msw_h1q, eps_reg, kdiag)

            def M(x):
                return jnp.concatenate([Mb(x[:nd]), Mb(x[nd:])])
        else:  # jacobi
            dinv = 1.0 / jnp.concatenate([kdiag, kdiag])
            M = lambda x: x * dinv  # noqa: E731

        w, kiters, krelres = krylov.gmres_solve(
            block_apply, b, tol=self.rtol, atol=self.atol,
            maxiter=self.max_iter,
            M=M, restart=40, return_info=True,
        )
        return w[:nd] * mask, w[nd:] * mask, kiters, krelres

    def solve(self):
        self.solve_step()

    # -- diagnostics -------------------------------------------------------
    def magnetic_field(self):
        """B = curl A at quadrature points: (B_re, B_im) [ne, nq, 3]."""
        return (hcurl.curl_at_quad(self.tab, self.A_re),
                hcurl.curl_at_quad(self.tab, self.A_im))

    def joule_heating_q(self):
        """q_J = 2 w^2 sigma |A|^2 at quadrature points."""
        omega = 2.0 * PI * self.current_frequency
        A2_re = hcurl.field_at_quad(self.tab, self.A_re)
        A2_im = hcurl.field_at_quad(self.tab, self.A_im)
        import jax.numpy as jnp

        return (2.0 * omega**2 * self.plasma_conductivity_q
                * jnp.sum(A2_re**2 + A2_im**2, axis=-1))

    def total_joule_heating(self):
        return float(hcurl.integrate(self.tab, self.joule_heating_q()))

    def magnetic_energy(self):
        """Cycle-averaged magnetic energy 1/(4 mu0) int (|B_re|^2+|B_im|^2)."""
        import jax.numpy as jnp

        B_re, B_im = self.magnetic_field()
        e = jnp.sum(B_re**2 + B_im**2, axis=-1)
        return float(hcurl.integrate(self.tab, e)) / (4.0 * self.mu0)


    def interpolate_By(self, nBy, yinterp_min, yinterp_max, by_file=None):
        """Sample B_y (real part) at nBy points along the y axis and
        optionally save them in the reference's By-file HDF5 layout:
        attribute nBy, /Points/y, /Magnetic-field/y (reference
        InterpolateToYAxis, src/quasimagnetostatic.cpp:555-650)."""
        import jax.numpy as jnp

        from ...fem.hcurl import _edge_basis_at
        from ...mesh.reference_element import ReferenceElement

        if nBy < 1:
            return None, None
        y = np.linspace(yinterp_min, yinterp_max, nBy)
        pts = np.stack([np.zeros(nBy), y, np.zeros(nBy)], axis=-1)

        mesh = self.mesh
        ev_all = mesh.vertices[mesh.elements]
        from ... import native as _native

        nat = _native.locate_points(ev_all, pts, tol=1e-8)
        if nat is None:
            from ...interop.interpolation import _invert_map

            ref = ReferenceElement(geom="hex", order=1, basis="gauss-lobatto")
            eids = np.zeros(nBy, dtype=np.int64)
            refc = np.zeros((nBy, 3))
            found = np.zeros(nBy, dtype=bool)
            lo = ev_all.min(axis=1) - 1e-8
            hi = ev_all.max(axis=1) + 1e-8
            for p in range(nBy):
                cand = np.where(((lo <= pts[p]) & (pts[p] <= hi)).all(axis=1))[0]
                for e in cand:
                    xi, res = _invert_map(ref, ev_all[e], pts[p])
                    if res < 1e-8 and (xi > -1e-9).all() and (xi < 1 + 1e-9).all():
                        eids[p], refc[p], found[p] = e, np.clip(xi, 0, 1), True
                        break
        else:
            eids, refc, found = nat

        # curl of A_re at the located reference points
        W, C = _edge_basis_at(refc)  # [np, 12, 3]
        ref = ReferenceElement(geom="hex", order=1, basis="gauss-lobatto")
        dN = ref.eval_geom_basis_grad(refc)  # [np, 8, 3]
        ev = ev_all[eids]  # [np, 8, 3]
        J = np.einsum("pvi,pvj->pij", ev, dN)
        detJ = np.linalg.det(J)
        aloc = np.asarray(self.A_re)[np.asarray(self.tab.elem_edges)[eids]] \
            * np.asarray(self.tab.edge_sign)[eids]  # [np, 12]
        Cref = np.einsum("ped,pe->pd", C, aloc)
        B = np.einsum("pij,pj->pi", J, Cref) / detJ[:, None]
        By = np.where(found, B[:, 1], 0.0)

        if by_file:
            import h5py

            with h5py.File(by_file, "w") as f:
                f.attrs["nBy"] = nBy
                f.create_group("Points")["y"] = y
                f.create_group("Magnetic-field")["y"] = By
        return y, By


@register_solver("em")
class _Em3dFromConfig(QuasiMagnetostatic3D):
    """ini-driven construction (reference em-opts: [em] section,
    src/quasimagnetostatic.cpp:330-365 and src/em_options.hpp:43-124)."""

    def __init__(self, config, tps=None):
        from ...mesh.generators import box_3d

        inp = config.raw
        mesh_file = inp.get("em/mesh", None)
        ref_levels = inp.get("em/ref_levels", 0)
        mu0 = inp.get("em/permeability", 1.0)  # reference default: 1.0
        amplitude = inp.get("em/current_amplitude", 2.0e6)

        attr_currents = {}
        coils = []
        if mesh_file is not None:
            from ...mesh.mfem_reader import read_mesh
            from ...mesh.refine import refine_uniform

            mesh = read_mesh(mesh_file)
            if mesh.dim != 3 or mesh.geom not in ("hex", "tet"):
                raise NotImplementedError(
                    "3-D EM solver requires a hex or tet mesh "
                    f"(got {mesh.dim}-D {mesh.geom})")
            if ref_levels:
                mesh = refine_uniform(mesh, ref_levels)
            # reference ring convention: attribute 1 = background, 2..5 =
            # coil rings; bottom rings are 2,3 and top rings 4,5
            # (src/quasimagnetostatic.cpp:236-271)
            J0 = {a: amplitude for a in (2, 3, 4, 5)}
            if inp.get("em/bot_only", False):
                J0[4] = J0[5] = 0.0
            elif inp.get("em/top_only", False):
                J0[2] = J0[3] = 0.0
            if inp.get("em/variable_current", False):
                var = inp.get_vec("em/varcurrent_amplitude", 5,
                                  default=[0.0] * 5)
                for a in (2, 3, 4, 5):
                    J0[a] = 0.5 * float(var[a - 1])
            attr_currents = J0
        else:
            n = inp.get("em/mesh_n", 8)
            L = inp.get("em/domain_size", 1.0)
            mesh = box_3d(n, n, n, bounds=((-L / 2, L / 2),) * 3)
            ncoil = inp.get("em/numCoils", 1)
            for i in range(1, ncoil + 1):
                coils.append((
                    inp.get(f"em/coil{i}/z0", 0.0),
                    inp.get(f"em/coil{i}/r1", 0.25),
                    inp.get(f"em/coil{i}/r2", 0.3),
                    inp.get(f"em/coil{i}/half_height", 0.05),
                ))
            mu0 = inp.get("em/permeability", MU0)  # physical for box coils

        super().__init__(
            mesh, coils=tuple(coils),
            attr_currents=attr_currents,
            current_axis=tuple(inp.get_vec("em/current_axis", 3,
                                           default=[0.0, 1.0, 0.0])),
            mu0=mu0,
            current_frequency=inp.get("em/current_frequency",
                                      6.0e6 if mesh_file is None else 1.0),
            current_amplitude=amplitude,
            rtol=inp.get("em/rtol", 1e-8),
            atol=inp.get("em/atol", 0.0),
            max_iter=inp.get("em/max_iter", 600),
            preconditioner=inp.get("em/preconditioner", "auto"),
            partitions=inp.get("em/partitions", 1),
            devices=getattr(config, "devices", None),
            order=inp.get("em/order", 1),
            preconditioner_background_sigma=inp.get(
                "em/preconditioner_background_sigma", -1.0),
        )
        self.config = config
        self.nBy = inp.get("em/nBy", 0)
        self.yinterp_min = inp.get("em/yinterp_min", 0.0)
        self.yinterp_max = inp.get("em/yinterp_max", 1.0)
        self.by_file = inp.get("em/By_file", "By.h5")

    def solve(self):
        super().solve()
        if self.nBy > 0:
            self.interpolate_By(self.nBy, self.yinterp_min,
                                self.yinterp_max, self.by_file)
