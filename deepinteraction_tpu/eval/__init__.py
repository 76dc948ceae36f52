from .nuscenes_metrics import evaluate_detections, DetectionFrame

__all__ = ["evaluate_detections", "DetectionFrame"]
