from raw_ngp_tpu.mesh.extract import (
    clean_mesh,
    decimate_mesh,
    export_meshes,
    export_ply,
    load_ply,
    marching_tetrahedra,
    mark_unseen_triangles,
)
