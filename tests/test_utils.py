"""Diagnostics writers, checkpointing, rendering, config, scenes."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smoothed_particle_hydrodynamics_tpu.config import SphConfig
from smoothed_particle_hydrodynamics_tpu.models import SCENES, make_scene
from smoothed_particle_hydrodynamics_tpu.state import ParticleState, StepDiagnostics
from smoothed_particle_hydrodynamics_tpu.utils import io as ckpt_io
from smoothed_particle_hydrodynamics_tpu.utils.diagnostics import (
    DiagnosticsWriter, detect_blowup)
from smoothed_particle_hydrodynamics_tpu.utils.render import render_frame, save_gif, save_png


def _diags(n=3):
    return StepDiagnostics(
        kinetic_energy=jnp.arange(n, dtype=jnp.float32) + 1,
        potential_energy=-jnp.ones((n,)) * 2,
        angular_momentum=jnp.zeros((n,)),
        neighbor_mean=jnp.full((n,), 4.5),
        neighbor_max=jnp.full((n,), 9, jnp.int32),
        neighbor_min=jnp.zeros((n,), jnp.int32),
        overflow_cells=jnp.zeros((n,), jnp.int32),
        truncated_ranges=jnp.zeros((n,), jnp.int32),
        halo_dropped=jnp.zeros((n,), jnp.int32),
        migration_dropped=jnp.zeros((n,), jnp.int32),
    )


def test_diagnostics_writer_schema(tmp_path):
    out = str(tmp_path)
    with DiagnosticsWriter(out) as w:
        w.write_block(0, _diags(), {"step": 1.5})
    energy = open(os.path.join(out, "energy.txt")).read().splitlines()
    # byte-compatible header (/root/reference/src/sph.cpp:163)
    assert energy[0] == "Step, Kinetic Energy, Potential Energy, Total Energy"
    assert energy[1].startswith("0, 1, -2, -1")
    timing = open(os.path.join(out, "timing.txt")).read().splitlines()
    assert timing[0].startswith("Step, Voxelize, Find Neighbors")
    nb = open(os.path.join(out, "neighbors.txt")).read().splitlines()
    assert nb[0] == "4, 9, 0"
    rows = [json.loads(l) for l in open(os.path.join(out, "diagnostics.jsonl"))]
    assert rows[0]["total_energy"] == -1.0 and rows[2]["step"] == 2


def test_detect_blowup():
    ok, _ = detect_blowup(_diags())
    assert not ok
    bad = _diags()._replace(kinetic_energy=jnp.asarray([1.0, jnp.nan, 2.0]))
    flag, why = detect_blowup(bad)
    assert flag and "finite" in why


def test_checkpoint_roundtrip(tmp_path):
    cfg = SphConfig(num_particles=32)
    state = ParticleState.zeros(32)
    state = state._replace(position=state.position + 1.25)
    d = str(tmp_path / "ck")
    p = ckpt_io.save_checkpoint(d, 7, cfg, state)
    assert ckpt_io.latest_checkpoint(d) == p
    step, cfg2, state2 = ckpt_io.load_checkpoint(p)
    assert step == 7 and cfg2 == cfg
    np.testing.assert_array_equal(np.asarray(state2.position), np.asarray(state.position))


def test_latest_checkpoint_picks_newest(tmp_path):
    cfg = SphConfig(num_particles=8)
    state = ParticleState.zeros(8)
    d = str(tmp_path / "ck")
    ckpt_io.save_checkpoint(d, 5, cfg, state)
    p2 = ckpt_io.save_checkpoint(d, 50, cfg, state)
    assert ckpt_io.latest_checkpoint(d) == p2


def test_render_frame_and_files(tmp_path):
    cfg, state = make_scene("disk", num_particles=1024)
    img = render_frame(cfg, state, size=128)
    assert img.shape == (128, 128) and img.dtype == np.uint8
    assert (img > 0).sum() > 50          # particles visible
    png = str(tmp_path / "f.png")
    save_png(img, png)
    assert os.path.getsize(png) > 100
    gif = str(tmp_path / "a.gif")
    save_gif([img, img], gif)
    assert os.path.exists(gif) or os.path.isdir(str(tmp_path / "a"))


def test_ansi_frame_shape_and_shading():
    """The terminal live view: rows lines of cols half-block cells, darker
    pixels mapping to lower xterm-256 greyscale indices."""
    from smoothed_particle_hydrodynamics_tpu.utils.render import ansi_frame

    img = np.zeros((64, 64), np.uint8)
    img[:32] = 255                        # bright top half
    s = ansi_frame(img, cols=20, rows=10)
    lines = s.split("\n")
    assert len(lines) == 10
    assert all(line.count("▀") == 20 for line in lines)
    assert "\x1b[38;5;255m" in lines[0]   # bright ramp top in the first row
    assert "\x1b[38;5;232m" in lines[-1]  # black ramp bottom in the last row
    # rgb input collapses to its max channel
    rgb = np.stack([img, np.zeros_like(img), np.zeros_like(img)], axis=-1)
    assert ansi_frame(rgb, cols=20, rows=10) == s


def test_config_json_roundtrip():
    cfg = SphConfig(viscosity=0.5, boundary="reflect", gravity=(0.0, -9.8, 0.0))
    cfg2 = SphConfig.from_json(cfg.to_json())
    assert cfg2 == cfg


def test_config_validation():
    with pytest.raises(ValueError):
        SphConfig(num_particles=0).validate()
    with pytest.raises(ValueError):
        SphConfig(h=-1.0).validate()


def test_all_scenes_construct():
    for name in SCENES:
        n = 2048 if "10m" not in name else 4096
        cfg, state = make_scene(name, num_particles=n)
        cfg.validate()
        assert state.position.shape == (cfg.num_particles, 3)
        pos = np.asarray(state.position)
        box = np.asarray(cfg.box_max)
        assert (pos >= 0).all() and (pos <= box).all(), name


def test_float32_derived_constants_match_reference():
    """Spot values from /root/reference/src/sph.cpp:46-95 evaluated in f32."""
    cfg = SphConfig()
    assert cfg.cell_size == np.float32(0.2)
    assert cfg.num_cells == 32768
    np.testing.assert_allclose(cfg.box_max, (6.4, 6.4, 6.4), rtol=1e-6)
    np.testing.assert_allclose(cfg.central_pos, (3.2, 3.2, 3.2), rtol=1e-6)
    assert cfg.num_steps == 1000
    assert cfg.softening_eff == np.float32(0.1)


def test_render_perspective():
    from smoothed_particle_hydrodynamics_tpu.utils.render import (
        render_frame_perspective)

    cfg, state = make_scene("disk", num_particles=2048)
    img = render_frame_perspective(cfg, state)
    assert img.shape == (512, 512) and img.dtype.name == "uint8"
    assert img.max() > 0, "perspective frame is empty"
