from .image import calc_ms_ssim, calc_psnr, ms_ssim, ssim, tensor_to_uint8
