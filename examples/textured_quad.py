"""textured_quad example (reference: examples/src/textured_quad/mod.rs): a
300px checker-textured quad under a pixel-matched orthographic camera,
purple clear color. Golden: textured_quad/screenshot.png."""

import sys

import numpy as np

sys.path.insert(0, ".")

from rend3_tpu import framework
from rend3_tpu.routine.pbr.material import AlbedoComponent, PbrMaterial
from rend3_tpu.types import (
    Camera,
    Handedness,
    MeshBuilder,
    MipmapCount,
    Object,
    Orthographic,
    StaticMeshKind,
    Texture,
    TextureFormat,
)
from rend3_tpu.utils import math as m3

CHECKER = "/root/reference/examples/src/textured_quad/checker.png"
CAMERA_DEPTH = 10.0


class TexturedQuadExample(framework.App):
    HANDEDNESS = Handedness.LEFT

    def clear_color(self):
        return (0.10, 0.05, 0.10, 1.0)

    def setup(self, context):
        from PIL import Image

        r = context.renderer
        size = 300.0
        mesh = (
            MeshBuilder(
                np.array(
                    [
                        [-size * 0.5, size * 0.5, 0.0],
                        [size * 0.5, size * 0.5, 0.0],
                        [size * 0.5, -size * 0.5, 0.0],
                        [-size * 0.5, -size * 0.5, 0.0],
                    ],
                    np.float32,
                ),
                Handedness.LEFT,
            )
            .with_vertex_uv0(np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32))
            .with_indices(np.array([0, 1, 2, 2, 3, 0], np.uint32))
            .build()
        )
        mesh_handle = r.add_mesh(mesh)

        img = np.asarray(Image.open(CHECKER).convert("RGBA"))
        tex = r.add_texture_2d(
            Texture(label="checker", data=img, format=TextureFormat.RGBA8_UNORM_SRGB, mip_count=MipmapCount.ONE)
        )
        material = r.add_material(PbrMaterial(albedo=AlbedoComponent.new_texture(tex), unlit=True))
        self.object = r.add_object(
            Object(mesh_kind=StaticMeshKind(mesh_handle), material=material, transform=np.eye(4))
        )
        w, h = context.resolution
        r.set_camera_data(
            Camera(
                projection=Orthographic(size=np.array([w, h, CAMERA_DEPTH], np.float32)),
                view=m3.translation([0.0, 0.0, 1.0]),
            )
        )


def main(out="textured_quad.png"):
    img = framework.render_single_frame(TexturedQuadExample(), 1280, 720)
    from rend3_tpu.testing import save_png

    save_png(out, img)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
