"""Pure-numpy warp kernels (no Spark imports here).

Semantics are pinned to the reference engine /root/reference/geowarp.js;
each module docstring carries file:line citations.
"""
