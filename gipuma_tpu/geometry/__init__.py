from . import camera, transforms
from .camera import Rig, HostCamera, CameraSet, build_rig, decompose_projection, rig_to_cameraset
