from gaussmart_tpu.ops.sh import eval_sh, rgb2sh, sh2rgb, SH_C0
from gaussmart_tpu.ops.ssim import ssim
from gaussmart_tpu.ops.image import psnr, mse, l1_loss, l2_loss
