"""Skinning example (reference: examples/src/skinning/mod.rs): RiggedSimple
glb with the skeleton posed via explicit joint transforms. Golden:
skinning/screenshot.png."""

import sys

import numpy as np

sys.path.insert(0, ".")

from rend3_tpu import framework
from rend3_tpu.gltf.loader import GltfLoadSettings, load_gltf_file
from rend3_tpu.types import Camera, DirectionalLight, Handedness, Perspective
from rend3_tpu.utils import math as m3

GLB_PATH = "/root/reference/examples/src/skinning/RiggedSimple.glb"


class SkinningExample(framework.App):
    HANDEDNESS = Handedness.LEFT

    def clear_color(self):
        return (0.10, 0.05, 0.10, 1.0)

    def setup(self, context):
        r = context.renderer
        self.loaded, self.instance, self.file = load_gltf_file(
            r, GLB_PATH, GltfLoadSettings(enable_directional=False)
        )
        # reference poses the two joints explicitly (skinning/mod.rs:33-55):
        # joint 0 = T(0,0,-4.18), joint 1 = Rx(30*sin(5t)) (0 at t=0).
        from rend3_tpu.types import Skeleton

        ibm = self.loaded.skins[0]["inverse_bind_matrices"]
        globals0 = np.stack([m3.translation([0.0, 0.0, -4.18]), np.eye(4, dtype=np.float32)])
        jm = Skeleton.compute_joint_matrices(globals0, ibm)
        for handles in self.instance.skeletons.values():
            for sk in handles:
                r.set_skeleton_joint_matrices(sk, jm)

        view = m3.translation([0.0, 0.0, 10.0])  # -(-10) along z
        r.set_camera_data(Camera(projection=Perspective(vfov=60.0, near=0.1), view=view))
        self.light = r.add_directional_light(
            DirectionalLight(
                color=np.ones(3),
                intensity=10.0,
                direction=np.array([-1.0, -4.0, 2.0], np.float32),
                distance=400.0,
                resolution=2048,
            )
        )


def main(out="skinning.png"):
    img = framework.render_single_frame(SkinningExample(), 1280, 720)
    from rend3_tpu.testing import save_png

    save_png(out, img)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
