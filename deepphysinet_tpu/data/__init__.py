from deepphysinet_tpu.data.geotiff import read_full_image, save_full_image
from deepphysinet_tpu.data.dataset import PhysicsDataset

__all__ = ["read_full_image", "save_full_image", "PhysicsDataset"]
