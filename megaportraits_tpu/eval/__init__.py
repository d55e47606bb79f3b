from megaportraits_tpu.eval.metrics import (
    calculate_l1,
    calculate_psnr,
    calculate_ssim,
    evaluate_metrics,
)
