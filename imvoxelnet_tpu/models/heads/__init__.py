from . import anchor3d_head, imvoxel_heads, layout_head  # noqa: F401
