"""Single-device simulation driver: the full PIC step, jitted.

This is the TPU re-expression of the reference's main time loop
(PIC_2D.cpp:171-420, phases A-H) completed with the particle stages its
report designed for (Mini_PIC_2D_Report.pdf Fig. 1):

  reference phase                      here
  ---------------------------------   -----------------------------------
  (missing) field interpolation        gather_chunk (matmul, MXU)
  (missing) particle advance           boris_push + advance_positions (VPU)
  (missing) current deposition         deposit_chunk (Esirkepov, MXU)
  A  updateBhalf                       update_b_half_periodic
  B  guard exchange (MPI)              pad_fields_periodic / extract_tiles
  C  updateEfull                       update_e_full_periodic (+J term)
  D/F guard exchanges                  implicit (roll stencils)
  G  tile migration (load balance)     rebin (sort into tile buckets)
  H  HDF5 save                         io.hdf5 (outside the jitted step)

Step ordering (leapfrog, E/B synchronized at integer steps — the
reference's two-half-B scheme):

  1. halo-pad fields at t^n, slice per-tile windows
  2. per species, scanned over capacity chunks:
       gather E^n,B^n -> Boris u^{n-1/2}->u^{n+1/2} -> move x^n->x^{n+1}
       -> Esirkepov J^{n+1/2} tile contributions
  3. fold J tiles -> global J
  4. B^n -> B^{n+1/2} -> E^{n+1} (with J) -> B^{n+1}
  5. boundary-wrap positions; re-bin every rebin_interval steps

The per-species chunk scan bounds the dense shape-matrix intermediates to
[T, kchunk, tile+2g] (deck.kchunk) so the pipeline stays in cache-friendly
blocks while every inner op is a batched matmul or fused VPU elementwise.
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .core.config import Deck
from .core.state import (
    CurrentState,
    FieldState,
    ParticleState,
    SimState,
    field_energy,
    kinetic_energy,
    momentum_sum,
)
from .fields import init as finit
from .fields.boundary import apply_damping, damping_mask
from .fields.halo import fold_block_periodic, pad_fields_periodic
from .fields.tiles import extract_field_tiles, fold_tiles
from .fields.yee import update_b_half_periodic, update_e_full_periodic
from .particles.binning import rebin, tile_counts, wrap_positions
from .particles.deposit import deposit_chunk
from .particles.gather import gather_chunk
from .particles.push import advance_positions, boris_push, velocities
from .particles.species import load_species


class StepDiag(NamedTuple):
    """Per-step on-device observables (SURVEY.md §5: the reference had no
    runtime metrics; these double as the energy/momentum-conservation
    diagnostics)."""

    field_energy: jax.Array
    kinetic_energy: jax.Array  # [n_species]
    overflow: jax.Array  # particles dropped at rebin
    momentum: jax.Array  # [n_species, 3] total w*u per species
    # Live particles per shard, all species — the per-chip WORK census
    # (occupancy-bounded kernels cost ~ live particles, so max/mean over
    # this array is the straggler skew; parallel/balance.py).  Shape
    # [rows*cols] sharded, [1] single-device.
    shard_live: jax.Array
    # Count of int8-engaged species whose LIVE weights are non-uniform —
    # the runtime guard behind the deck-time gate (SpeciesSpec.uniform_weights).
    # Non-zero means the integer-ring deposit is scaling currents with
    # the WRONG q*w; RunHistory.record raises on it (diag cadence).
    weight_nonuniform: jax.Array


def int8_weight_violations(deck, species_states, axes=()):
    """Count int8-engaged species whose LIVE weights are non-uniform.

    The int8 matched-quantization deposit factors the uniform q*w out of
    the integer-ring contraction as q*max(w) (ops/pallas/ppd_kernel.py);
    that is only correct when every live particle of the species shares
    one weight.  The deck gate (`SpeciesSpec.uniform_weights`) is a deck-time
    proxy — a custom seed_state editing weights per particle would
    deposit wrong currents SILENTLY while forces stay right (the class
    of bug behind docs/ROADMAP.md round-3 lesson 1).  This on-device
    census (free on the diag cadence) turns that into a loud error via
    RunHistory.record.

    `axes`: mesh axis names to reduce over inside shard_map — the check
    must be GLOBAL (per-shard maxima can each be uniform while differing
    across shards; the kernel's shard-local q*max(w) scale is then wrong
    on every shard).  A shard with zero live particles is vacuously
    uniform (dead slots deposit nothing).
    """
    bad = jnp.zeros((), jnp.int32)
    if deck.deposit != "int8":
        return bad
    for spec, p in zip(deck.species, species_states):
        if not spec.uniform_weights():
            continue  # weight-profile species fall back to the f32 path
        wmax = jnp.max(p.w)
        wmin = jnp.min(jnp.where(p.w > 0, p.w, jnp.inf))
        if axes:
            wmax = jax.lax.pmax(wmax, axes)
            wmin = jax.lax.pmin(wmin, axes)
        bad = bad + ((wmin != wmax) & jnp.isfinite(wmin)).astype(jnp.int32)
    return bad


def _tile_origins(tiling, dtype):
    t = jnp.arange(tiling.num_tiles)
    ox = (t % tiling.tile_cols).astype(dtype)[:, None] * tiling.tile_nx
    oy = (t // tiling.tile_cols).astype(dtype)[:, None] * tiling.tile_ny
    return ox, oy


def window_shift_now(step, window_x0, dt: float, tile_nx: int, dx: float):
    """Moving-window shift predicate, shared by ALL THREE drivers
    (single / block-sharded / striped — cross-driver parity is bit-level,
    so the f32 arithmetic must be ONE code path; never reimplement this
    comparison at a call site).  Shift when the light front has crossed
    the NEXT tile-column boundary beyond the shifts already taken.
    Anchoring on window_x0 (exact int32) instead of floor(step*dt) -
    floor((step-1)*dt) makes the schedule self-correcting: an f32
    rounding hiccup delays a shift by a step and the next step catches
    up, and nothing freezes at step ~2^24 where f32(step)+1 == f32(step)
    would kill an increment-based predicate for good.  Past ~2^24-scale
    step*dt products the f32 evaluation can jitter a shift by a step
    (still self-correcting, still driver-agreed); exact scheduling at
    that scale would need f64/rational arithmetic no current deck runs
    long enough to care about."""
    period = tile_nx * dx
    done = (window_x0 // tile_nx).astype(jnp.float32)
    t1 = (step.astype(jnp.float32) + 1.0) * jnp.float32(dt)
    return t1 >= (done + 1.0) * period


def window_injection_key(species_index: int, w0n):
    """Injection RNG key, shared by both drivers (and folded per GLOBAL
    tile row inside the loader): deterministic in (species, absolute
    window position) only, so restarts and any mesh decomposition inject
    identical plasma."""
    return jax.random.fold_in(
        jax.random.fold_in(jax.random.PRNGKey(0x77), species_index), w0n)


def advance_species_tiles(
    p: ParticleState,
    ftiles: FieldState,
    *,
    qm: float,
    q: float,
    order: int,
    tile_ny: int,
    tile_nx: int,
    origins: Tuple[jax.Array, jax.Array],
    g: int,
    dt: float,
    dx: float,
    dy: float,
    kchunk: int,
    vma_axes: Tuple[str, ...] = (),
    backend: str = "xla",
    interpret: bool = False,
    gather_precision: str = "exact",
    deposit_mode: str = "",
    qw0: float = 0.0,
    red_mode: str = "",
    wrap: Optional[Tuple[int, int]] = None,
    grid: Optional[Tuple[int, int]] = None,
    return_disp: bool = False,
    w_synth: bool = False,
) -> Tuple[ParticleState, Tuple[jax.Array, jax.Array, jax.Array]]:
    """Gather + push + move + deposit for one species over its tile
    buffers, scanned in slot chunks.  Returns the pushed particles
    (positions unwrapped) and this species' J tile stack.

    origins: ([T,1], [T,1]) global cell coordinates of each tile's interior
    origin (traced values in sharded runs, where they derive from the mesh
    coordinate).
    """
    t_total, cap = p.num_tiles, p.capacity
    kc = cap if kchunk <= 0 or cap % kchunk else kchunk
    nc = cap // kc
    nxt, nyt = tile_nx, tile_ny
    ox, oy = origins

    if backend == "pallas":
        from .ops.pallas.ppd_kernel import fused_push_deposit

        # Occupancy watermark: highest live slot + 1.  Equals the live count
        # for freshly-sorted buckets and stays correct when incremental
        # re-binning leaves interior holes (w == 0 below the watermark).
        counts = jnp.max(
            (jnp.arange(cap, dtype=jnp.int32)[None, :] + 1)
            * (p.w > 0).astype(jnp.int32),
            axis=1,
        )
        kwargs = dict(
            qm=qm, q=q, order=order, tile_ny=nyt, tile_nx=nxt, g=g,
            dt=dt, dx=dx, dy=dy, kc=kc, gather_precision=gather_precision,
            deposit_mode=deposit_mode, qw0=qw0, red_mode=red_mode,
            wrap=wrap, grid=grid, return_disp=return_disp,
            vma_axes=vma_axes, w_synth=w_synth,
        )
        if interpret:
            kwargs["interpret"] = True
        return fused_push_deposit(p, ftiles, counts, (ox, oy), **kwargs)

    def chunked(a):  # [T, cap] -> [nc, T, kc]
        return a.reshape(t_total, nc, kc).transpose(1, 0, 2)

    xs = jax.tree_util.tree_map(chunked, p)
    nyg, nxg = nyt + 2 * g, nxt + 2 * g
    j0 = tuple(jnp.zeros((t_total, nyg, nxg), p.x.dtype) for _ in range(3))
    if vma_axes:
        # Inside shard_map the scan carry must carry the same varying-axis
        # type as the body outputs (jax>=0.9 vma typing).
        j0 = tuple(jax.lax.pcast(z, vma_axes, to="varying") for z in j0)

    def body(carry, chunk: ParticleState):
        jx, jy, jz = carry
        # Nearest-image centering (see tile_local_coords): box-wrapped
        # particles in stale boundary buckets fold back into the tile's
        # guard band instead of sitting +-nx off-window.
        xi0, eta0 = tile_local_coords(chunk.x, chunk.y, (ox, oy), nxt, nyt, grid)
        ef = gather_chunk(ftiles, xi0, eta0, nyt, nxt, g, order)
        px, py, pz = boris_push(
            chunk.px, chunk.py, chunk.pz, ef.ex, ef.ey, ef.ez, ef.bx, ef.by, ef.bz, qm, dt
        )
        x1, y1 = advance_positions(chunk.x, chunk.y, px, py, pz, dt, dx, dy)
        _, _, vz = velocities(px, py, pz)
        djx, djy, djz = deposit_chunk(
            xi0, eta0, xi0 + (x1 - chunk.x), eta0 + (y1 - chunk.y), vz,
            q * chunk.w, nyt, nxt, g, order, dt, dx, dy
        )
        out = ParticleState(x1, y1, px, py, pz, chunk.w)
        return (jx + djx, jy + djy, jz + djz), out

    (jx, jy, jz), ys = jax.lax.scan(body, j0, xs)

    def unchunk(a):  # [nc, T, kc] -> [T, cap]
        return a.transpose(1, 0, 2).reshape(t_total, cap)

    p_out = jax.tree_util.tree_map(unchunk, ys)
    if return_disp:
        return p_out, (jx, jy, jz), max_step_displacement([p_out], dt, dx, dy)
    return p_out, (jx, jy, jz)


def tile_local_coords(x, y, origins, tile_nx: int, tile_ny: int,
                      grid: Optional[Tuple[int, int]] = None):
    """Bucket-tile-local coordinates with nearest-image centering.

    Between re-binning passes a particle may sit in a stale bucket; if it
    wrapped the periodic box its raw offset to the bucket's tile is ~+-nx.
    Centering folds it back into the tile's guard band so shape windows
    stay valid.  grid=(nx, ny) for periodic domains; None = raw offsets."""
    ox, oy = origins
    xi = x - ox
    eta = y - oy
    if grid is not None:
        gnx, gny = grid
        # Reciprocal multiply, NOT division: bit-identical to the pallas
        # kernel's fold (ppd_kernel), so diagnostics (rho for continuity/
        # Gauss) evaluate shapes at the same f32 coordinates the deposit
        # used — required for the quantized (int8) deposit's exactness
        # check, where a 1-ulp coordinate gap can flip a shape quantum.
        xi = xi - gnx * jnp.floor((xi + (gnx - tile_nx) * 0.5) * (1.0 / gnx))
        eta = eta - gny * jnp.floor((eta + (gny - tile_ny) * 0.5) * (1.0 / gny))
    return xi, eta


def max_step_displacement(species_states, dt: float, dx: float, dy: float):
    """Largest per-axis displacement (in cells) any alive particle made
    this step, from the pushed momenta — the on-device observable behind
    drift-triggered re-binning (Deck.rebin_trigger)."""
    disp = jnp.zeros((), jnp.float32)
    for p in species_states:
        inv_g = jax.lax.rsqrt(1.0 + p.px * p.px + p.py * p.py + p.pz * p.pz)
        m = jnp.maximum(jnp.abs(p.px) * (dt / dx), jnp.abs(p.py) * (dt / dy))
        m = jnp.where(p.w > 0, m * inv_g, 0.0)
        disp = jnp.maximum(disp, jnp.max(m).astype(jnp.float32))
    return disp


def resolve_backend(deck: Deck) -> Tuple[str, bool]:
    """(backend, interpret): fused Pallas kernel on TPU/f32 by default;
    'on' forces it (interpreted off-TPU, for tests)."""
    on_tpu = jax.default_backend() == "tpu"
    if deck.use_pallas == "on":
        return "pallas", not on_tpu
    if deck.use_pallas == "auto" and on_tpu and deck.dtype == jnp.float32:
        return "pallas", False
    return "xla", False


def build_step(deck: Deck):
    """Compile-ready step function SimState -> (SimState, StepDiag)."""
    deck.validate()
    tiling = deck.tiling
    g = deck.guard
    dt, dx, dy = deck.dt, deck.dx, deck.dy
    backend, interpret = resolve_backend(deck)
    periodic = deck.boundary == "periodic"
    mask = (
        None
        if periodic
        else damping_mask(deck.ny, deck.nx, deck.absorb_width, dtype=deck.dtype)
    )

    def step(state: SimState) -> Tuple[SimState, StepDiag]:
        f = state.fields
        fpad = pad_fields_periodic(f, g)
        ftiles = extract_field_tiles(
            fpad, tiling.tile_rows, tiling.tile_cols, tiling.tile_ny, tiling.tile_nx, g
        )

        new_species = []
        jx = jy = jz = None
        kes = []
        moms = []
        # Periodic wrap rides the kernel's position store on the pallas
        # path (saves a full pass over the particle arrays); the XLA path
        # and absorbing boundaries wrap/absorb below.
        kernel_wrap = (deck.nx, deck.ny) if (periodic and backend == "pallas") else None
        center_grid = (deck.nx, deck.ny) if periodic else None
        trigger_drift = bool(deck.species) and deck.uses_drift_trigger()
        disps = []
        for spec, p in zip(deck.species, state.species):
            adv = advance_species_tiles(
                p,
                ftiles,
                qm=spec.charge / spec.mass,
                q=spec.charge,
                order=spec.shape_order,
                tile_ny=tiling.tile_ny,
                tile_nx=tiling.tile_nx,
                origins=_tile_origins(tiling, deck.dtype),
                g=g,
                dt=dt,
                dx=dx,
                dy=dy,
                kchunk=deck.kchunk,
                backend=backend,
                interpret=interpret,
                gather_precision=deck.gather_precision,
                deposit_mode=deck.deposit,
                # Uniform-weight species (SpeciesSpec.uniform_weights:
                # no density profile, or count-mode with declared n_max)
                # factor q*w out of the deposit contraction — gates the
                # int8 matched-quantization deposit (deck.deposit /
                # MINIPIC_DEPOSIT_MODE = "int8"); the actual uniform
                # value is read from the state at call time (q * max(w)),
                # so seed_state weight rescales stay correct.
                qw0=(spec.charge * dx * dy / spec.ppc
                     if spec.uniform_weights() else 0.0),
                wrap=kernel_wrap,
                grid=center_grid,
                return_disp=trigger_drift,
                # w-stream elision: sound only when buckets stay
                # live-compacted between re-bins — periodic decks (no
                # absorbing/window kills) with the compacting loader.
                w_synth=periodic,
            )
            if trigger_drift:
                pnew, (sjx, sjy, sjz), sdisp = adv
                disps.append(sdisp)
            else:
                pnew, (sjx, sjy, sjz) = adv
            jx = sjx if jx is None else jx + sjx
            jy = sjy if jy is None else jy + sjy
            jz = sjz if jz is None else jz + sjz
            new_species.append(pnew)
            kes.append(kinetic_energy(pnew, spec.mass))
            moms.append(momentum_sum(pnew, spec.mass))

        if jx is not None:
            def to_global(t):
                tr = t.reshape(
                    tiling.tile_rows, tiling.tile_cols, tiling.tile_ny + 2 * g, tiling.tile_nx + 2 * g
                )
                return fold_block_periodic(fold_tiles(tr, tiling.tile_ny, tiling.tile_nx, g), g)

            j = CurrentState(to_global(jx), to_global(jy), to_global(jz))
        else:
            j = None

        f = update_b_half_periodic(f, dt, dx, dy)
        f = update_e_full_periodic(f, dt, dx, dy, j)
        f = update_b_half_periodic(f, dt, dx, dy)
        if mask is not None:
            f = apply_damping(f, mask)

        use_incremental = (
            deck.rebin_mode == "incremental"
            or (deck.rebin_mode == "auto" and backend == "pallas")
        )
        # Interval schedule: when the guard affords one extra CFL step, a
        # mover-buffer overflow defers the tile losslessly to the next step
        # (exactly the drift trigger's deferral budget) instead of forcing
        # an immediate drop-and-count.  The deferred-backlog marker rides
        # SimState.drift, unused by this schedule otherwise (0 = clean,
        # 1 = backlog pending).
        interval_grace = use_incremental and (
            (deck.rebin_interval + 1) * deck.cfl_step_cells()
            <= deck.guard - deck.shape_reach()
        )

        # Moving window: a shift rolls BUCKETS, so any particle that left
        # its trailing-column tile since the last re-bin would be dropped
        # with its stale bucket despite being in-window — force the
        # buckets fresh on shift steps (computed here so the re-bin
        # predicate below can fold it in; the shift itself happens after
        # re-binning).
        if deck.moving_window:
            if state.window_x0 is None:
                raise ValueError(
                    "deck.moving_window but SimState.window_x0 is unset — "
                    "initialize it to 0 (Simulation does)")
            shift_now = window_shift_now(state.step, state.window_x0, dt,
                                         tiling.tile_nx, dx)
        else:
            shift_now = None

        if trigger_drift:
            if state.drift is None:
                raise ValueError(
                    "deck uses drift-triggered re-binning but SimState.drift "
                    "is unset — initialize it to 0.0 (Simulation does)"
                )
            disp = functools.reduce(jnp.maximum, disps)
            drift_now = state.drift + disp
            do_rebin_pred = drift_now > deck.drift_threshold()
            # Beyond this line a deferred re-bin may no longer wait:
            # extract with counted drops rather than corrupt physics.
            force_flag = drift_now > deck.force_threshold()
            if shift_now is not None:
                # A shift rolls buckets, so deferral is not an option on
                # shift steps: a pending mover in a trailing-column
                # bucket would be dropped UNcounted with the column.
                # Forced extraction drops-and-counts instead.
                do_rebin_pred = do_rebin_pred | shift_now
                force_flag = force_flag | shift_now
        else:
            drift_now = state.drift
            sched = (
                None if deck.rebin_interval == 1
                else state.step % deck.rebin_interval == 0
            )
            if interval_grace:
                pending_prev = state.drift > 0.5
                do_rebin_pred = (
                    None if sched is None else (sched | pending_prev)
                )
                force_flag = pending_prev  # drain the backlog, then drop
            else:
                do_rebin_pred = sched
                force_flag = True  # no deferral budget in the guard
            if shift_now is not None:
                # No deferral into a bucket roll (see the drift branch).
                if do_rebin_pred is not None:
                    do_rebin_pred = do_rebin_pred | shift_now
                force_flag = jnp.logical_or(force_flag, shift_now)

        overflow = jnp.zeros((), jnp.int32)
        pending_total = jnp.zeros((), jnp.int32)
        binned = []
        for p in new_species:
            if kernel_wrap is None:
                p = wrap_positions(p, deck.nx, deck.ny, periodic)

            mc = deck.mover_cap(p.capacity) if use_incremental else 0
            if use_incremental and mc > 0:
                from .particles.binning import rebin_auto

                sc = deck.mover_seg_cap(mc)

                def do(pp, sc=sc):
                    return rebin_auto(pp, tiling, mc, interpret=interpret,
                                      force=force_flag, seg_cap=sc)
            else:
                def do(pp):
                    out, ov = rebin(pp, tiling)
                    return out, ov, jnp.zeros((), jnp.int32)

            if do_rebin_pred is None:
                p, ov, pend = do(p)
            else:
                def skip(pp):
                    z = jnp.zeros((), jnp.int32)
                    return pp, z, z

                p, ov, pend = jax.lax.cond(do_rebin_pred, do, skip, p)
            overflow = overflow + ov
            pending_total = pending_total + pend
            binned.append(p)

        if trigger_drift:
            # Reset the budget only after a complete re-bin; deferred
            # backlog (pending) keeps the budget hot so the next step
            # re-triggers and drains it.
            drift_now = jnp.where(
                do_rebin_pred & (pending_total == 0), 0.0, drift_now
            )
        elif interval_grace:
            did = (
                jnp.bool_(True) if do_rebin_pred is None else do_rebin_pred
            )
            drift_now = jnp.where(
                did, (pending_total > 0).astype(jnp.float32), drift_now
            )

        live = jnp.zeros((), jnp.int32)
        for p in binned:
            live = live + jnp.sum((p.w > 0).astype(jnp.int32))
        diag = StepDiag(
            field_energy=field_energy(f, dx, dy),
            kinetic_energy=jnp.stack(kes) if kes else jnp.zeros((0,), deck.dtype),
            overflow=overflow,
            momentum=jnp.stack(moms) if moms else jnp.zeros((0, 3), deck.dtype),
            shard_live=live.reshape(1),
            weight_nonuniform=int8_weight_violations(deck, binned),
        )
        window_x0 = state.window_x0
        if deck.moving_window:
            # Tile-quantum window advance: the frame follows the pulse at
            # c = 1, shifting one TILE COLUMN whenever the lab-frame light
            # front crosses another tile_nx cells.  Shifting by tile
            # quanta makes the particle side a pure bucket roll: tile-
            # local coordinates (and hence the drift watermark, shape
            # windows, and re-bin budget) are untouched; only the stored
            # window-frame x picks up a -tile_nx.  Trailing-column
            # particles outflow (physical, not counted as overflow); the
            # leading column is loaded fresh at its ABSOLUTE position
            # (inject_column), RNG keyed by the absolute column so a
            # restarted run injects identical plasma.
            from .particles.species import inject_column

            shift_c = tiling.tile_nx

            col_mask = jax.lax.broadcasted_iota(
                jnp.int32, (deck.ny, deck.nx), 1) < (deck.nx - shift_c)

            def _shift(args):
                f_, sps, w0 = args
                w0n = w0 + shift_c
                f_ = FieldState(*(
                    jnp.where(col_mask, jnp.roll(c, -shift_c, axis=1), 0.0)
                    for c in f_))
                out = []
                for i, (spec, p) in enumerate(zip(deck.species, sps)):
                    key = window_injection_key(i, w0n)
                    inj = inject_column(spec, deck.domain, tiling,
                                        p.capacity, key, w0n, deck.dtype)
                    chans = []
                    for name in ParticleState._fields:
                        a = getattr(p, name).reshape(
                            tiling.tile_rows, tiling.tile_cols, -1)
                        a = jnp.roll(a, -1, axis=1)
                        if name == "x":
                            a = a - shift_c
                        a = a.at[:, -1, :].set(getattr(inj, name))
                        chans.append(a.reshape(p.num_tiles, p.capacity))
                    out.append(ParticleState(*chans))
                return f_, tuple(out), w0n

            def _keep(args):
                return args

            f, binned, window_x0 = jax.lax.cond(
                shift_now, _shift, _keep, (f, tuple(binned), window_x0))
            binned = list(binned)

        new_state = SimState(
            fields=f, species=tuple(binned), step=state.step + 1,
            drift=drift_now, window_x0=window_x0,
        )
        return new_state, diag

    return step


# ----------------------------------------------------------------------


class Simulation:
    """User-facing driver (the reference's `main` PIC_2D.cpp:22-463, minus
    the MPI boilerplate).  Holds a deck, builds initial state, owns the
    jitted step.  IO/diagnostics live outside the jit boundary."""

    def __init__(self, deck: Deck, fields: Optional[FieldState] = None, seed: int = 0):
        deck.validate()
        self.deck = deck
        tiling = deck.tiling
        cap = deck.capacity()
        # Buckets stay kchunk-aligned (or 512-aligned for whole-bucket
        # chunks: the re-bin kernels slice in 128-lane blocks, and the
        # int8 deposit's 4-way K-fold needs kc/4 lane-aligned — Mosaic
        # rejects tpu.concatenate of mixed-lane-offset slices; <=1.4%
        # extra slots).  A larger MINIPIC_SPLIT_KC raises the alignment
        # so the split kernel's cap % kc requirement holds; split_kc_env
        # rounds the env value to the 512 quantum both sides share.
        from .ops.pallas.rebin_kernels import split_kc_env
        q = deck.kchunk if deck.kchunk > 0 else split_kc_env()
        if cap % q:
            cap = -(-cap // q) * q
        key = jax.random.PRNGKey(seed)
        species = []
        for i, spec in enumerate(deck.species):
            species.append(
                load_species(
                    spec, deck.domain, tiling, cap, jax.random.fold_in(key, i), deck.dtype
                )
            )
        if fields is None:
            fields = FieldState.zeros(deck.ny, deck.nx, deck.dtype)
        self.state = SimState(
            fields=fields, species=tuple(species), step=jnp.zeros((), jnp.int32),
            drift=jnp.zeros((), jnp.float32),
            window_x0=(jnp.zeros((), jnp.int32) if deck.moving_window
                       else None),
        )
        self._step = jax.jit(build_step(deck))
        self._capmgrs = None  # per-species CapacityManagers, lazily built

    def step(self, n: int = 1) -> StepDiag:
        diag = None
        for _ in range(n):
            self.state, diag = self._step(self.state)
        return diag

    def ensure_capacity(self, overflow: int = 0) -> bool:
        """Adapt particle bucket capacity to the load (the adaptive-capacity
        half of the load-balance story, parallel/balance): grow on overflow
        or high occupancy, shrink back after a sustained calm spell so a
        transient hot spot does not inflate every tile's dense compute for
        the rest of the run.  Returns True if capacity changed (the jitted
        step retraces on the new shapes; geometric growth + shrink
        hysteresis bound the number of recompiles over a run)."""
        from .parallel.balance import CapacityManager, census, with_capacity

        if self._capmgrs is None:
            self._capmgrs = [CapacityManager() for _ in self.state.species]
        changed = False
        species = list(self.state.species)
        for i, (p, mgr) in enumerate(zip(species, self._capmgrs)):
            new_cap = mgr.plan(census(p), overflow)
            if new_cap is None:
                continue
            # Same alignment rule as __init__: kchunk multiple, or the
            # shared 512-quantum split_kc_env for whole-bucket mode.
            from .ops.pallas.rebin_kernels import split_kc_env
            q = self.deck.kchunk if self.deck.kchunk > 0 else split_kc_env()
            cap = -(-new_cap // q) * q
            if cap > p.capacity:
                species[i] = with_capacity(p, cap)
                changed = True
            elif cap < p.capacity:
                try:
                    species[i] = with_capacity(p, cap, self.deck.tiling)
                    changed = True
                except ValueError:
                    # The positional census (drifted particles in stale
                    # buckets) does not fit the smaller buckets yet —
                    # defer the shrink to a later calm check.
                    pass
        if changed:
            self.state = self.state._replace(species=tuple(species))
        return changed

    def run(self, n_steps: Optional[int] = None, save_every: Optional[int] = None, saver=None):
        """Run the deck; call `saver(state, step)` on the save cadence
        (reference Phase H, PIC_2D.cpp:414-419)."""
        n_steps = n_steps if n_steps is not None else self.deck.total_steps
        save_every = save_every if save_every is not None else self.deck.save_frequency
        if saver is not None:
            saver(self.state, 0)
        diag = None
        check_every = 50  # CapacityManager cadence (census syncs the device)
        for i in range(1, n_steps + 1):
            self.state, diag = self._step(self.state)
            ovf = int(diag.overflow)
            if ovf > 0 or i % check_every == 0:
                self.ensure_capacity(ovf)
            if saver is not None and i % save_every == 0:
                saver(self.state, i)
        return diag
