from pdc_tpu.data.scene import SceneStructure
from pdc_tpu.data.synthetic import SyntheticScene, make_orbit_pose
