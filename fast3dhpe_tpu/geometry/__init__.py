"""Pure-functional camera geometry (jnp).

Batched, jit-friendly equivalents of the reference's geometry kernel
(/root/reference/tools/common.py) and the geometry buried inside the
reference model (/root/reference/models/cdrnet.py:45-222).
"""

from .camera import (  # noqa: F401
    world_to_camera,
    camera_to_image,
    get_projection_matrix,
    project_3d_to_2d,
    project_points,
    rodrigues,
)
from .triangulation import (  # noqa: F401
    triangulate_closed_form,
    dlt_triangulate,
    sii_triangulate,
    pinv_projection,
)
from .affine import (  # noqa: F401
    get_affine_transform,
    affine_transform_points,
    fliplr_joints,
    compose_projection_with_affine,
    update_intrinsics_with_affine,
)
