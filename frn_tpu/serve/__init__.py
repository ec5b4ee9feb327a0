from frn_tpu.serve.engine import Detections, ServeOptions, ServingEngine
from frn_tpu.serve.http import DetectionServer

__all__ = ["Detections", "ServeOptions", "ServingEngine", "DetectionServer"]
