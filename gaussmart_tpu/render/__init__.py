from gaussmart_tpu.render.api import render
