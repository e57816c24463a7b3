"""pwnfps-tpu: a TPU-native raytraced portal engine.

A ground-up jax/XLA/Pallas rebuild of the capability set of
fanzyflani/pwnfps (7DFPS 2014): real-time raytracing of a portal-linked
non-Euclidean 2.5D world.  The per-pixel recursive CPU ray march of the
reference becomes a batched wavefront tracer running as one jitted device
call per frame; the host keeps the game loop, scripting and physics.
"""

__version__ = "0.1.0"
