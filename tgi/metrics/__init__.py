from tgi.metrics.msssim import ssim, ms_ssim
