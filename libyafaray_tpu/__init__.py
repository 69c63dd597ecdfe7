"""libyafaray_tpu — a TPU-native physically-based Monte-Carlo renderer.

A brand-new JAX/XLA/Pallas wavefront re-design of the capability surface of
libYafaRay (reference: OpenRendererBenchmark/libYafaRay — a recursive,
thread-per-tile CPU ray tracer).  Nothing here is a port: the hot path is a
jitted wavefront pipeline over SoA ray arenas; the scene is compiled into
flat device arrays; parallelism is `jax.sharding` over a device mesh instead
of std::thread tile workers.

Layer map (mirrors SURVEY.md §1):
  core/         L0  math, color, QMC, sampling warps
  scene/        L1,L8,L9  params, meshes, scene compile, public interface
  accel/        L2  BVH build (host + native C++), flattened node arrays
  ops/          L2  device intersection kernels (brute / BVH traversal)
  materials/    L3  BSDF families as SoA-table masked kernels
  textures/     L3  image + procedural textures, shader nodes
  lights/       L4  light sampling / photon emission
  backgrounds/  L4  constant/gradient/texture(IBL)/sunsky/darksky
  volumes/      L5  participating media
  integrators/  L6  directlighting, pathtracing, photonmapping, SPPM
  film/         L7  image film, filters, adaptive AA, passes, save/load
  parallel/     —   multi-chip sharding (shard_map + psum film)
  io/           Lx  image handlers
  cli/          L10 yafaray-xml compatible CLI
"""

__version__ = "0.1.0"
