"""Particle kernel unit tests: shapes, Boris push, gather, and the
Esirkepov continuity identity (the correctness keystone of the deposition
scheme — SURVEY.md §7 hard part #1)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minipic_tpu.core.state import FieldState
from minipic_tpu.particles.deposit import deposit_chunk, deposit_rho_chunk
from minipic_tpu.particles.gather import gather_chunk
from minipic_tpu.particles.push import advance_positions, boris_push
from minipic_tpu.particles.shapes import shape_matrix


# ---------------------------------------------------------------- shapes
@pytest.mark.parametrize("order", [1, 2])
@pytest.mark.parametrize("offset", [0.0, 0.5])
def test_shape_partition_of_unity(order, offset):
    rng = np.random.default_rng(3)
    pos = jnp.asarray(rng.uniform(0, 8, size=(2, 64)))
    s = shape_matrix(pos, 8, 2, offset, order)
    np.testing.assert_allclose(np.asarray(s.sum(-1)), 1.0, atol=1e-12)
    # First moment reproduces the position (B-splines are exact to linear).
    coords = np.arange(12) - 2 + offset
    np.testing.assert_allclose(np.asarray((s * coords).sum(-1)), np.asarray(pos), atol=1e-10)


# ---------------------------------------------------------------- push
def test_boris_conserves_energy_in_pure_b():
    """Magnetic rotation must preserve |u| exactly (Boris property)."""
    px, py, pz = jnp.float64(0.3), jnp.float64(0.1), jnp.float64(-0.2)
    z = jnp.float64(0.0)
    for _ in range(100):
        px, py, pz = boris_push(px, py, pz, z, z, z, z, z, jnp.float64(2.0), -1.0, 0.05)
    p2 = float(px**2 + py**2 + pz**2)
    np.testing.assert_allclose(p2, 0.3**2 + 0.1**2 + 0.2**2, rtol=1e-14)


def test_gyro_frequency():
    """Relativistic cyclotron frequency omega_c = qB/(gamma m)."""
    b0, u0 = 1.0, 0.5
    gamma = math.sqrt(1 + u0**2)
    dt = 0.02
    px, py, pz = jnp.float64(u0), jnp.float64(0.0), jnp.float64(0.0)
    z = jnp.float64(0.0)
    # px ~ u0 cos(omega_c t): the first zero crossing is a quarter period.
    t, prev = 0.0, float(px)
    quarter_period = None
    for i in range(2000):
        px, py, pz = boris_push(px, py, pz, z, z, z, z, z, jnp.float64(b0), -1.0, dt)
        t += dt
        if prev > 0 >= float(px):
            quarter_period = t
            break
        prev = float(px)
    expected = 0.5 * math.pi * gamma / b0  # (2 pi gamma / (|q| B / m)) / 4
    assert quarter_period is not None
    np.testing.assert_allclose(quarter_period, expected, rtol=2e-2)


def test_exb_drift():
    """Crossed fields: guiding center drifts at E x B / B^2."""
    e0, b0 = 0.02, 1.0
    dt = 0.05
    px = py = pz = jnp.float64(0.0)
    x = y = jnp.float64(0.0)
    for _ in range(4000):
        px, py, pz = boris_push(
            px, py, pz, jnp.float64(e0), 0.0, 0.0, 0.0, 0.0, jnp.float64(b0), -1.0, dt
        )
        x, y = advance_positions(x, y, px, py, pz, dt, 1.0, 1.0)
    t = 4000 * dt
    v_drift = e0 / b0  # E x B / B^2 -> -y direction for q=-1? (sign below)
    # Drift velocity is independent of charge: v = E x B / B^2 = (0, -e0*b0, 0)/b0^2
    np.testing.assert_allclose(float(y) / t, -v_drift, rtol=5e-2)
    assert abs(float(x) / t) < 0.3 * v_drift  # gyration average, no secular x


# ---------------------------------------------------------------- gather
@pytest.mark.parametrize("order", [1, 2])
def test_gather_uniform_field_is_exact(order):
    t_total, kc, nyt, nxt, g = 3, 16, 8, 8, 2
    vals = dict(ex=1.0, ey=-2.0, ez=0.5, bx=3.0, by=-1.5, bz=0.25)
    ftiles = FieldState(
        **{k: jnp.full((t_total, nyt + 2 * g, nxt + 2 * g), v, jnp.float64) for k, v in vals.items()}
    )
    rng = np.random.default_rng(5)
    xi = jnp.asarray(rng.uniform(0, nxt, (t_total, kc)))
    eta = jnp.asarray(rng.uniform(0, nyt, (t_total, kc)))
    got = gather_chunk(ftiles, xi, eta, nyt, nxt, g, order)
    for name, v in vals.items():
        np.testing.assert_allclose(np.asarray(getattr(got, name)), v, atol=1e-12)


def test_gather_linear_field_is_exact_with_stagger(order=1):
    """A field linear in x/y is reproduced exactly by B-spline interpolation
    — and only if the stagger offsets are right."""
    t_total, kc, nyt, nxt, g = 1, 32, 8, 8, 2
    ax, ay = 0.7, -0.3
    iy = jnp.arange(nyt + 2 * g, dtype=jnp.float64)[:, None]
    ix = jnp.arange(nxt + 2 * g, dtype=jnp.float64)[None, :]

    def lin(offx, offy):
        # value = ax * x + ay * y at the component's staggered coordinates
        return (ax * (ix - g + offx) + ay * (iy - g + offy)) * jnp.ones((t_total, 1, 1))

    ftiles = FieldState(
        ex=lin(0.5, 0.0), ey=lin(0.0, 0.5), ez=lin(0.0, 0.0),
        bx=lin(0.0, 0.5), by=lin(0.5, 0.0), bz=lin(0.5, 0.5),
    )
    rng = np.random.default_rng(7)
    xi = jnp.asarray(rng.uniform(1, nxt - 1, (t_total, kc)))
    eta = jnp.asarray(rng.uniform(1, nyt - 1, (t_total, kc)))
    got = gather_chunk(ftiles, xi, eta, nyt, nxt, g, order)
    want = ax * np.asarray(xi) + ay * np.asarray(eta)
    for name in ("ex", "ey", "ez", "bx", "by", "bz"):
        np.testing.assert_allclose(np.asarray(getattr(got, name)), want, atol=1e-10, err_msg=name)


# ---------------------------------------------------------------- deposit
@pytest.mark.parametrize("order", [1, 2])
def test_esirkepov_discrete_continuity(order):
    """(rho1 - rho0)/dt + div_Yee J == 0 exactly, per tile, for random
    sub-cell moves — the defining property of Esirkepov deposition and the
    test that pins down every stagger/index convention."""
    t_total, kc, nyt, nxt, g = 4, 64, 10, 12, 2
    dt, dx, dy = 0.07, 0.5, 0.4
    rng = np.random.default_rng(11)
    xi0 = jnp.asarray(rng.uniform(0, nxt, (t_total, kc)))
    eta0 = jnp.asarray(rng.uniform(0, nyt, (t_total, kc)))
    xi1 = xi0 + jnp.asarray(rng.uniform(-0.95, 0.95, (t_total, kc)))
    eta1 = eta0 + jnp.asarray(rng.uniform(-0.95, 0.95, (t_total, kc)))
    vz = jnp.asarray(rng.normal(size=(t_total, kc)))
    qw = jnp.asarray(rng.uniform(0.1, 1.0, (t_total, kc))) * jnp.asarray(
        rng.choice([-1.0, 1.0], (t_total, kc))
    )

    jx, jy, jz = deposit_chunk(xi0, eta0, xi1, eta1, vz, qw, nyt, nxt, g, order, dt, dx, dy)
    rho0 = deposit_rho_chunk(xi0, eta0, qw, nyt, nxt, g, order, dx, dy)
    rho1 = deposit_rho_chunk(xi1, eta1, qw, nyt, nxt, g, order, dx, dy)

    jx, jy = np.asarray(jx), np.asarray(jy)
    drho = (np.asarray(rho1) - np.asarray(rho0)) / dt
    div = np.zeros_like(drho)
    div[:, :, 1:] += (jx[:, :, 1:] - jx[:, :, :-1]) / dx
    div[:, 1:, :] += (jy[:, 1:, :] - jy[:, :-1, :]) / dy
    # Valid where the Yee divergence has both neighbors: indices >= 1.
    resid = (drho + div)[:, 1:, 1:]
    scale = np.abs(jx).max() / dx
    assert np.abs(resid).max() < 1e-12 * max(scale, 1.0), np.abs(resid).max()


def test_deposit_static_particle_zero_current():
    t_total, kc, nyt, nxt, g = 2, 8, 8, 8, 2
    rng = np.random.default_rng(13)
    xi = jnp.asarray(rng.uniform(0, nxt, (t_total, kc)))
    eta = jnp.asarray(rng.uniform(0, nyt, (t_total, kc)))
    qw = jnp.ones((t_total, kc))
    jx, jy, jz = deposit_chunk(
        xi, eta, xi, eta, jnp.zeros_like(xi), qw, nyt, nxt, g, 1, 0.1, 1.0, 1.0
    )
    assert float(jnp.abs(jx).max()) == 0.0
    assert float(jnp.abs(jy).max()) == 0.0
    assert float(jnp.abs(jz).max()) == 0.0


def test_deposit_total_current_matches_velocity():
    """sum_cells J * dx * dy == sum_k q w v (Galilean consistency of the
    cell-integrated current)."""
    t_total, kc, nyt, nxt, g = 1, 16, 12, 12, 3
    dt, dx, dy = 0.1, 0.5, 0.5
    rng = np.random.default_rng(17)
    xi0 = jnp.asarray(rng.uniform(2, nxt - 2, (t_total, kc)))
    eta0 = jnp.asarray(rng.uniform(2, nyt - 2, (t_total, kc)))
    ux = rng.uniform(-0.8, 0.8, (t_total, kc))
    uy = rng.uniform(-0.8, 0.8, (t_total, kc))
    xi1 = xi0 + jnp.asarray(ux) * dt / dx
    eta1 = eta0 + jnp.asarray(uy) * dt / dy
    vz = jnp.asarray(rng.normal(size=(t_total, kc)))
    qw = jnp.asarray(rng.uniform(0.5, 1.0, (t_total, kc)))
    jx, jy, jz = deposit_chunk(xi0, eta0, xi1, eta1, vz, qw, nyt, nxt, g, 1, dt, dx, dy)
    np.testing.assert_allclose(
        float(jx.sum()) * dx * dy, float((qw * ux).sum()), rtol=1e-12
    )
    np.testing.assert_allclose(
        float(jy.sum()) * dx * dy, float((qw * uy).sum()), rtol=1e-12
    )
    np.testing.assert_allclose(
        float(jz.sum()) * dx * dy, float((qw * vz).sum()), rtol=1e-12
    )


def test_count_mode_loading_thins_counts_not_weights():
    """load_mode='count': constant weight, live counts follow the density
    profile, and total charge matches the weight-mode load (same plasma,
    different discretization)."""
    import jax.numpy as jnp
    from minipic_tpu.core.config import Deck, SpeciesSpec

    def ramp(x, y):
        return 0.1 + 3.9 * (x / 16.0)

    base = dict(charge=-1.0, mass=1.0, ppc=16, density=ramp)
    deck_kw = dict(box_x=16.0, box_y=16.0, nx=32, ny=32, tile_nx=8, tile_ny=8)
    from minipic_tpu.particles.species import load_species

    dw = Deck(species=(SpeciesSpec("w", **base),), **deck_kw)
    dc = Deck(species=(SpeciesSpec("c", load_mode="count", **base),), **deck_kw)
    cap = dw.capacity()
    import jax

    pw = load_species(dw.species[0], dw.domain, dw.tiling, cap, jax.random.PRNGKey(0))
    pc = load_species(dc.species[0], dc.domain, dc.tiling, cap, jax.random.PRNGKey(0))

    # constant weight among live slots
    live_w = np.asarray(pc.w)[np.asarray(pc.w) > 0]
    assert live_w.size and np.allclose(live_w, live_w[0])
    # counts follow the ramp: right-edge tiles hold many more than left
    counts = np.asarray(jnp.sum((pc.w > 0).astype(jnp.int32), axis=1))
    counts = counts.reshape(dc.tiling.tile_rows, dc.tiling.tile_cols)
    assert counts[:, -1].min() > 5 * counts[:, 0].max()
    # same total charge as the weight-mode load to the thinning quantization
    qw = float(np.asarray(pw.w).sum())
    qc = float(np.asarray(pc.w).sum())
    assert abs(qc - qw) / qw < 0.05, (qc, qw)
