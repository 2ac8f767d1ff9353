"""mrt — a TPU-native differentiable path-tracing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``nickmass/mass-raytrace`` (a recursive, multi-threaded CPU ray tracer in
Rust).  Nothing here is a port: the recursive `Camera::trace`
(reference: world.rs:65-79) becomes a batched wavefront bounce loop
(`mrt.integrator.wavefront`), trait-object scenes become SoA arrays
(`mrt.geometry.scene`), `Box<dyn Material>` dispatch becomes masked
vectorised shading (`mrt.materials`), and `std::thread` row-stealing
becomes `shard_map` tile/sample sharding over a TPU mesh
(`mrt.parallel`).

Layout:
    mrt.math        vector math, counter-based RNG, closed-form sampling
    mrt.core        camera, rays, render configuration
    mrt.geometry    spheres, triangles, BVH, instances, volumes, scene SoA
    mrt.materials   material table + batched scatter/emit, backgrounds
    mrt.textures    texture atlas, bilinear sampling, wrap modes, combinators
    mrt.integrator  wavefront path-tracing integrator + AOV passes
    mrt.ops         Pallas TPU kernels for the hot paths
    mrt.parallel    device-mesh sharding, collectives, distributed init
    mrt.loaders     OBJ/MTL, PLY, STL asset loaders
    mrt.scenes      the scene zoo (RTIOW, Cornell, SphereGrid, Menger, ...)
    mrt.runtime     accumulation, tonemap, PNG IO, checkpointing, config
"""

__version__ = "0.1.0"

import os as _os

# Persistent compilation cache: wavefront programs are large (bounce
# while_loop x ray batching) and this environment's remote compiles are
# slow; caching them across processes cuts cold starts from minutes to
# seconds.  Opt out with MRT_NO_COMPILE_CACHE=1.
if (not _os.environ.get("MRT_NO_COMPILE_CACHE")
        and _os.environ.get("JAX_PLATFORMS", "").lower()
        not in ("cpu", "")):
    # TPU-only: CPU AOT entries written on other machines mis-load.
    import jax as _jax

    _cache_dir = _os.environ.get(
        "MRT_COMPILE_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "mrt_jax"))
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without the knobs: run uncached
        pass
