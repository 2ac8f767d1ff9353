"""The frame/animation driver — the reference's `worker()` loop.

Orchestrates scene generation, rendering, display-mode export, animation
frames with ETA reporting, input record/replay, checkpointing and
optional profiling (reference: src/main.rs:81-148 worker, 121-140
animation export + ETA, 418-433 export & display modes).
"""

from __future__ import annotations

import os
import time

from .. import scenes
from .config import RenderConfig
from .film import Film, DisplayMode
from .input import InputCollection, InputRecorder, InputReplay
from .io import save_png
from .render import render


def _denoiser_for(config):
    if (config.denoise
            or config.display_mode == DisplayMode.DENOISE.value):
        from .denoise import make_denoiser
        return make_denoiser()
    return None


def render_frame(scene, camera, config: RenderConfig, film=None,
                 progress=None):
    """Render one frame per the config (single- or multi-device)."""
    needs_aov = (config.denoise
                 or config.display_mode in ("denoise", "albedo", "normal"))
    if config.mesh_tile is not None or config.mesh_spp > 1:
        from ..parallel.mesh import make_mesh
        from ..parallel.render import render_sharded

        mesh = make_mesh(tile=config.mesh_tile, spp=config.mesh_spp)
        film = render_sharded(
            scene, camera, config.width, config.height, mesh,
            spp=config.spp, seed=config.seed, max_depth=config.max_depth,
            samples_per_pass=config.samples_per_pass, film=film,
            persistent=config.persistent)
        if needs_aov:
            from .render import aov_pass
            albedo, normal = aov_pass(scene, camera, width=config.width,
                                      height=config.height,
                                      seed=config.seed)
            film = film.with_aov(albedo, normal)
        return film
    return render(scene, camera, config.width, config.height,
                  spp=config.spp, seed=config.seed,
                  max_depth=config.max_depth,
                  samples_per_pass=config.samples_per_pass,
                  with_aov=needs_aov, film=film, progress=progress,
                  persistent=config.persistent, rr_depth=config.rr_depth,
                  sort_rays=config.sort_rays)


def export(film: Film, path, config: RenderConfig):
    mode = DisplayMode(config.display_mode)
    save_png(path, film.to_rgb_bytes(mode, denoiser=_denoiser_for(config)))


def run(config: RenderConfig, log=print):
    """Top-level entry: single frame or animation (main.rs:81-148)."""
    scene_factory = scenes.get(config.scene)
    sc = scene_factory(aspect_ratio=config.aspect_ratio)

    replay = InputReplay(config.read_input) if config.read_input else None
    recorder = InputRecorder() if config.write_input else None

    if config.profile_dir:
        import jax
        jax.profiler.start_trace(config.profile_dir)

    try:
        if getattr(config, "serve", False) or getattr(config, "play",
                                                      False):
            from .viewer import serve
            return serve(config, log=log)
        if not config.animate:
            inp = replay.frame(0) if replay else InputCollection()
            scene, camera = sc.generate(0.0, 0, inp)
            if config.nee:
                from ..geometry.scene import attach_lights
                scene = attach_lights(scene)
            film = None
            if config.checkpoint and os.path.exists(config.checkpoint):
                film, seed = Film.load_state(config.checkpoint)
                config.seed = seed
                log(f"resuming from {config.checkpoint} at "
                    f"{int(film.samples)} spp")
            t0 = time.time()

            def progress(f, _cfg=config):
                # Progressive checkpointing doubles as elastic recovery:
                # a device fault mid-render resumes from the last pass
                # (the reference loses everything, SURVEY §5).
                if _cfg.checkpoint:
                    f.save_state(_cfg.checkpoint, seed=_cfg.seed)
                if _cfg.preview:
                    export(f, _cfg.output, _cfg)

            attempts = 3 if config.checkpoint else 1
            for attempt in range(attempts):
                try:
                    film = render_frame(scene, camera, config, film=film,
                                        progress=progress)
                    film.sum.block_until_ready()
                    break
                except Exception as e:
                    if attempt + 1 == attempts:
                        raise
                    log(f"render attempt {attempt + 1} failed ({e}); "
                        f"resuming from checkpoint")
                    if os.path.exists(config.checkpoint):
                        film, _ = Film.load_state(config.checkpoint)
            log(f"rendered {config.spp} spp in {time.time() - t0:.1f}s")
            if config.checkpoint:
                film.save_state(config.checkpoint, seed=config.seed)
            export(film, config.output, config)
            log(f"wrote {config.output}")
            return film

        # Animation loop (main.rs:104-140).
        total = config.total_frames
        start = time.time()
        film = None
        for frame in range(total):
            t = frame / total
            inp = replay.frame(frame) if replay else InputCollection()
            if recorder is not None:
                recorder.record(inp)
            scene, camera = sc.generate(t, frame, inp)
            if config.nee:
                from ..geometry.scene import attach_lights
                scene = attach_lights(scene)
            film = render_frame(scene, camera,
                                _frame_config(config), film=None)
            film.sum.block_until_ready()
            path = os.path.join(config.animation_dir,
                                f"frame_{frame:05d}.png")
            export(film, path, config)
            elapsed = time.time() - start
            eta = elapsed / (frame + 1) * (total - frame - 1)
            log(f"frame {frame + 1}/{total} "
                f"({elapsed:.0f}s elapsed, ETA {eta:.0f}s)")
        if recorder is not None:
            recorder.save(config.write_input)
        return film
    finally:
        if config.profile_dir:
            import jax
            jax.profiler.stop_trace()


def _frame_config(config: RenderConfig):
    import dataclasses
    return dataclasses.replace(config, spp=config.samples_per_frame)
