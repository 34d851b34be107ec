"""Dataset-generation drivers and CLI apps, preserving the reference CLI surface:

- ``warp_tool``   ≙ warp_image binary (ARAP/warping/src/main.cpp)
- ``deform_tool`` ≙ arap_deform binary (ARAP/deformation/src/main.cpp)
- ``para_gen``    ≙ para_gen.py (primary parallel dataset generator)
- ``generate``    ≙ generate.py (phase-by-phase serial generator)
- ``run_arap`` / ``run_warp`` ≙ batch drivers
- ``texture_gen`` ≙ texture_gen.py (procedural random-texture renderer)
"""
