from gaussmart_tpu.parallel.sharding import (make_mesh, make_dp_train_step,
                                             replicate)
