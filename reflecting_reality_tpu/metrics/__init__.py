from reflecting_reality_tpu.metrics.calculator import MetricsCalculator, compute_metrics
from reflecting_reality_tpu.metrics.functional import iou, psnr, psnr_ssim, ssim

__all__ = ["MetricsCalculator", "compute_metrics", "iou", "psnr", "psnr_ssim", "ssim"]
