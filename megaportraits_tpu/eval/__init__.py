from megaportraits_tpu.eval.metrics import (
    calculate_aed,
    calculate_akd,
    calculate_csim,
    calculate_fid,
    calculate_l1,
    calculate_psnr,
    calculate_ssim,
    evaluate_metrics,
)
