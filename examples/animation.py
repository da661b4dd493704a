"""Animation example (reference: examples/src/animation/mod.rs): two animated
glTF scenes posed per frame via rend3_tpu.anim. Golden: animation/screenshot.png."""

import sys

import numpy as np

sys.path.insert(0, ".")

from rend3_tpu import anim, framework
from rend3_tpu.gltf.loader import GltfLoadSettings, load_gltf_file
from rend3_tpu.types import Camera, DirectionalLight, Handedness, Perspective
from rend3_tpu.utils import math as m3

SCENE = "/root/reference/examples/src/animation/resources/scene.gltf"
CUBE3 = "/root/reference/examples/src/animation/resources/cube_3.gltf"


class AnimationExample(framework.App):
    HANDEDNESS = Handedness.LEFT

    def clear_color(self):
        return (0.10, 0.05, 0.10, 1.0)

    def setup(self, context):
        r = context.renderer
        # NOTE reference view: translation(+view_location) with (0, -1.5, 5)
        view = m3.translation([0.0, -1.5, 5.0])
        r.set_camera_data(Camera(projection=Perspective(vfov=60.0, near=0.1), view=view))

        self.objects = []
        for path in (SCENE, CUBE3):
            loaded, instance, _ = load_gltf_file(r, path, GltfLoadSettings(enable_directional=False))
            data = anim.AnimationData.from_gltf_scene(loaded, instance)
            self.objects.append({"loaded": loaded, "instance": instance, "data": data, "t": 0.0})

        self.light = r.add_directional_light(
            DirectionalLight(
                color=np.ones(3),
                intensity=10.0,
                direction=np.array([-1.0, -4.0, 2.0], np.float32),
                distance=20.0,
                resolution=2048,
            )
        )

    def handle_redraw(self, context):
        for ob in self.objects:
            if not ob["loaded"].animations:
                continue
            dur = max(
                (float(ch["times"].max()) for ch in ob["loaded"].animations[0]["channels"] if len(ch["times"])),
                default=0.0,
            )
            if dur > 0:
                ob["t"] = (ob["t"] + context.delta_t_seconds) % dur
            anim.pose_animation_frame(
                context.renderer, ob["loaded"], ob["instance"], ob["data"], 0, ob["t"]
            )


def main(out="animation.png"):
    img = framework.render_single_frame(AnimationExample(), 1280, 720)
    from rend3_tpu.testing import save_png

    save_png(out, img)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
