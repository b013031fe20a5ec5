from gaussmart_tpu.models.gaussians import (GaussianParams, GaussianAux,
                                            GaussianState, init_from_pcd)
