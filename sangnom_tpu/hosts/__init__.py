"""Host-environment adapters.

The reference is a plugin inside a scripting host (AviSynth,
reference src/SangNom2.cpp:474-484 registers `SangNom2`/`SangNom` into the
host's function table).  This package provides the same integration for
hosts this framework can reach:

  * `sangnom_tpu.hosts.vapoursynth` — a VapourSynth adapter exposing the
    filter as dimension-aware `std.ModifyFrame` graph nodes (VapourSynth is
    the reference's own upstream: the plugin is a port of
    vapoursynth-sangnom, reference README.md:5).
  * the in-process CLI host (`sangnom_tpu.cli`) and the plain registry
    surface (`sangnom_tpu.api.register_plugin_functions`).
"""
