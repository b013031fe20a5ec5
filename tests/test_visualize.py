import numpy as np


def test_dino_heatmap_cli(tmp_path, rng):
    from PIL import Image
    from gaussmart_tpu.semantics import visualize

    img = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
    src = str(tmp_path / "in.png")
    dst = str(tmp_path / "out.png")
    Image.fromarray(img).save(src)
    visualize.main(["-i", src, "-o", dst, "--random_encoder"])
    with Image.open(dst) as out:
        assert out.size == (64, 48)


def test_heatmap_range(rng):
    from gaussmart_tpu.semantics.dino import DinoEncoder
    from gaussmart_tpu.semantics.visualize import cls_patch_heatmap

    enc = DinoEncoder.random(depth=1, dim=96, n_heads=3, image_size=64)
    heat = cls_patch_heatmap(enc, rng.random((3, 50, 70)).astype(np.float32))
    assert heat.shape == (4, 4)
    assert heat.min() >= 0 and heat.max() <= 1
