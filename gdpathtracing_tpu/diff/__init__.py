from gdpathtracing_tpu.diff.inverse import (image_mse, render_loss,
                                            value_and_grad_step,
                                            replace_albedo, replace_emission,
                                            replace_vertices,
                                            replace_camera_transform)

__all__ = [
    "image_mse", "render_loss", "value_and_grad_step", "replace_albedo",
    "replace_emission", "replace_vertices", "replace_camera_transform",
]
