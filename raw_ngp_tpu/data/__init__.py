from raw_ngp_tpu.data.sampler import bayer_lossmult, sample_ray_batch
from raw_ngp_tpu.data.scene import SceneData, SceneMeta
from raw_ngp_tpu.data.synthetic import look_at_pose, make_synthetic_scene
