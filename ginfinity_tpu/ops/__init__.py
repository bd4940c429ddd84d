from ginfinity_tpu.ops.dp import affine_align, affine_align_batch

__all__ = ["affine_align", "affine_align_batch"]
