"""Multi-chip scaling: jax.sharding over a device mesh with XLA collectives.

The reference is a single-process desktop app whose concurrency is thread pools and SPSC
rings (SURVEY.md §2.8); the TPU-native equivalents built here are:

- tp (tensor-parallel analog): one large eigensolve shards its ELEMENTS over devices —
  each device applies its element blocks to the replicated panel and a `psum` over the
  scattered partials yields the full K@X / M@X. The Rayleigh-Ritz Gram matrices reduce the
  same way. This parallelizes the dominant cost (element matvecs) over ICI.
- dp (data-parallel analog): corpus-scale batch solves and the polyphonic render shard
  the OBJECT axis — each device advances its own objects' resonators; the mix is a psum.

All collectives are expressed with shard_map so they ride ICI, never the host.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_names=("dp", "tp")) -> Mesh:
    """A device mesh shaped to `axis_names`: 1-D puts every device on that axis; 2-D
    factors n into dp x tp with the largest tp <= sqrt(n) (prime/small counts
    degenerate tp to 1)."""
    devices = np.asarray(jax.devices()[: n_devices or len(jax.devices())])
    n = devices.size
    if len(axis_names) == 1:
        return Mesh(devices.reshape(n), axis_names)
    # Largest tp that divides n and is <= sqrt(n), so dp >= tp.
    tp = 1
    for cand in range(int(np.sqrt(n)), 0, -1):
        if n % cand == 0:
            tp = cand
            break
    dp = n // tp
    return Mesh(devices.reshape(dp, tp), axis_names)


def _pad_to(x: np.ndarray, n: int, axis: int = 0):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, n - x.shape[axis])
    return np.pad(x, pad)


def shard_element_ops(ops, mesh: Mesh, axis: str = "tp"):
    """The PRODUCTION tensor-parallel entry (VERDICT r3 #2): re-place an assembled
    `ElementOperators` with its element arrays sharded over `axis` and the shared
    arrays replicated.

    This is the scaling-book recipe, not a hand-written collective layer: the
    eigensolver's jitted stages (solve/eigs.py:_iter_stage, lobpcg._pcg_block, the
    AMG Galerkin scan) take the operator pytree as a jit ARGUMENT, so GSPMD reads
    these shardings, partitions every element einsum over the mesh axis, and inserts
    the psum after each segment-sum — the same reduction points as the reference's
    Rayleigh-Ritz Grams (src/audio/mesh2modes.cpp:379-398). Padding elements carry
    zero blocks and scatter into dof 0: harmless adds.
    """
    from ..fem.assembly import ElementOperators

    n_sh = int(mesh.shape[axis])
    e = int(ops.elem_dofs.shape[0])
    e_pad = -(-e // n_sh) * n_sh
    shard = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def pe(x, sharded=True):
        x = np.asarray(x)
        if sharded:
            x = np.pad(x, [(0, e_pad - e)] + [(0, 0)] * (x.ndim - 1))
        return jax.device_put(x, shard if sharded else rep)

    return ElementOperators(
        elem_dofs=pe(ops.elem_dofs),
        elem_nodes=pe(ops.elem_nodes),
        k_blocks=pe(ops.k_blocks),
        k_blocks_f32=pe(ops.k_blocks_f32),
        k_lo=pe(ops.k_lo),
        rho_vol=pe(ops.rho_vol),
        rho_vol_f32=pe(ops.rho_vol_f32),
        m_unit=pe(ops.m_unit, sharded=False),
        k_fix=pe(ops.k_fix, sharded=False),
        m_fix=pe(ops.m_fix, sharded=False),
        n_dofs=ops.n_dofs,
    )


def shard_synth(synth, mesh: Mesh, axis: str = "dp"):
    """Object-shard a live ModalSynth: bank params and resonator state place over
    `axis` (the DealObjects analog, ModalAudio.cpp:708-740); event/voice tables and
    the track pool stay replicated (every device sees all excitation, renders its own
    objects' resonators, and the mono mix reduces with the psum GSPMD inserts for the
    cross-object sum). Pads the object axis; padded objects have zero coefficients.
    Forces the scan render path (the Pallas kernel is a single-device program)."""
    from ..synth.bank import BankParams, BankState

    n_sh = int(mesh.shape[axis])
    o = int(synth.params.out_gain.shape[0])
    o_pad = -(-o // n_sh) * n_sh
    shard = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def po(x):
        x = np.asarray(x)
        return jax.device_put(
            np.pad(x, [(0, o_pad - o)] + [(0, 0)] * (x.ndim - 1)), shard
        )

    synth.params = BankParams(
        coeff_re=po(synth.params.coeff_re),
        coeff_im=po(synth.params.coeff_im),
        disp_scale=po(synth.params.disp_scale),
        shapes=po(synth.params.shapes),
        out_gain=po(synth.params.out_gain),
        sample_rate=synth.params.sample_rate,
    )
    synth.state = BankState(z_re=po(synth.state.z_re), z_im=po(synth.state.z_im))
    for table in ("impacts", "voices", "pool"):
        t = getattr(synth, table)
        setattr(
            synth,
            table,
            jax.tree_util.tree_map(lambda a: jax.device_put(a, rep), t),
        )
    synth.use_pallas = False  # the VMEM kernel is single-device; scan path partitions
    return synth


def shard_elements(elem_dofs, k_blocks, rho_vol, mesh: Mesh, axis: str = "tp"):
    """Pad the element arrays to a multiple of the axis size and place them sharded over
    `axis`. Padding elements scatter into dof 0 with zero blocks (harmless adds)."""
    n_shards = mesh.shape[axis]
    e = elem_dofs.shape[0]
    e_pad = ((e + n_shards - 1) // n_shards) * n_shards
    elem_dofs = _pad_to(np.asarray(elem_dofs), e_pad)
    k_blocks = _pad_to(np.asarray(k_blocks), e_pad)
    rho_vol = _pad_to(np.asarray(rho_vol), e_pad)
    sharding = NamedSharding(mesh, P(axis))
    return (
        jax.device_put(elem_dofs, sharding),
        jax.device_put(k_blocks, sharding),
        jax.device_put(rho_vol, sharding),
    )


def sharded_pencil_ops(mesh: Mesh, elem_dofs, k_blocks, rho_vol, m_unit, n_dofs, axis="tp"):
    """Matrix-free K@X / M@X with elements sharded over `axis` and X replicated: each shard
    computes its partial scatter, a psum completes the sum — the tensor-parallel analog of
    the reference's single-threaded panel solve (mesh2modes.cpp:375)."""

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), None, None),
        out_specs=P(),
    )
    def _kmat(ed, kb, rv, mu, x):
        xe = x[ed]  # (E_shard, 30, p)
        ye = jnp.einsum("eij,ejp->eip", kb, xe)
        partial_sum = jax.ops.segment_sum(
            ye.reshape(-1, ye.shape[-1]), ed.reshape(-1), num_segments=n_dofs
        )
        return jax.lax.psum(partial_sum, axis)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), None, None),
        out_specs=P(),
    )
    def _mmat(ed, kb, rv, mu, x):
        xe = x[ed]
        ye = rv[:, None, None] * jnp.einsum("ij,ejp->eip", mu, xe)
        partial_sum = jax.ops.segment_sum(
            ye.reshape(-1, ye.shape[-1]), ed.reshape(-1), num_segments=n_dofs
        )
        return jax.lax.psum(partial_sum, axis)

    def kmat(x):
        return _kmat(elem_dofs, k_blocks, rho_vol, m_unit, x)

    def mmat(x):
        return _mmat(elem_dofs, k_blocks, rho_vol, m_unit, x)

    return kmat, mmat


def sharded_subspace_step(mesh: Mesh, kmat, mmat, axis="tp"):
    """One Rayleigh-Ritz subspace-refinement step over the sharded pencil: the 'training
    step' of the modal solver. X panel is replicated; the heavy matvecs run element-sharded
    under `kmat`/`mmat` (which psum internally)."""

    @jax.jit
    def step(x, sigma):
        kx = kmat(x)
        mx = mmat(x)
        # Gram matrices of the shifted pencil restricted to span(X).
        a = x.T @ (kx - sigma * mx)
        b = x.T @ mx
        a = 0.5 * (a + a.T)
        b = 0.5 * (b + b.T)
        bw, bu = jnp.linalg.eigh(b)
        good = bw > 1e-12 * jnp.max(jnp.abs(bw))
        inv_sqrt = jnp.where(good, 1.0 / jnp.sqrt(jnp.where(good, bw, 1.0)), 0.0)
        w = bu * inv_sqrt[None, :]
        h = w.T @ a @ w
        theta, q = jnp.linalg.eigh(0.5 * (h + h.T))
        return x @ (w @ q), theta + sigma

    return step


def batched_render_step(mesh: Mesh, axis="dp"):
    """Object-sharded resonator advance: each device renders its objects for one block and
    the mono mix reduces with a psum — the data-parallel analog of the reference's
    DealObjects worker split (ModalAudio.cpp:708-740), with the renderer-order summation
    replaced by a deterministic collective."""

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), None),
        out_specs=(P(axis), P(axis), P()),
    )
    def step(z_re, z_im, c_re, c_im, out_gain, excite_t):
        # excite_t: (S,) shared per-sample excitation row (strikes pre-projected per object
        # are sharded via z/c in real use; this step carries the structure).
        def body(carry, e_s):
            zr, zi = carry
            new_re = zr * c_re - zi * c_im + e_s
            new_im = zr * c_im + zi * c_re
            return (new_re, new_im), (out_gain[:, None] * new_im).sum()

        (z_re, z_im), out = jax.lax.scan(body, (z_re, z_im), excite_t)
        return z_re, z_im, jax.lax.psum(out, axis)

    return step
