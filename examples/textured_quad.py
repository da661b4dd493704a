"""textured_quad example (reference: examples/src/textured_quad/mod.rs): an
unlit checker-textured quad under an orthographic camera."""

import sys

import numpy as np

sys.path.insert(0, ".")

from rend3_tpu import framework
from rend3_tpu.routine.pbr.material import AlbedoComponent, PbrMaterial, SampleType
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


class TexturedQuadExample(framework.App):
    HANDEDNESS = Handedness.LEFT

    def clear_color(self):
        return (0.2, 0.2, 0.2, 1.0)

    def setup(self, context):
        from PIL import Image

        r = context.renderer
        mesh = (
            MeshBuilder(
                np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32),
                Handedness.LEFT,
            )
            .with_vertex_uv0(np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32))
            .with_indices(np.array([0, 1, 2, 0, 2, 3], np.uint32))
            .build()
        )
        mesh_handle = r.add_mesh(mesh)

        img = np.asarray(Image.open(CHECKER).convert("RGBA"))
        tex = r.add_texture_2d(
            Texture(label="checker", data=img, format=TextureFormat.RGBA8_UNORM_SRGB, mip_count=MipmapCount.ONE)
        )
        material = r.add_material(
            PbrMaterial(
                albedo=AlbedoComponent.new_texture(tex),
                unlit=True,
                sample_type=SampleType.NEAREST,
            )
        )
        self.object = r.add_object(
            Object(
                mesh_kind=StaticMeshKind(mesh_handle),
                material=material,
                transform=m3.translation([0.0, 0.0, 0.0]) @ m3.scale([10.0, 10.0, 1.0]),
            )
        )
        r.set_camera_data(
            Camera(
                projection=Orthographic(size=np.array([30.0, 30.0, 1.0], np.float32) * 1.0),
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
