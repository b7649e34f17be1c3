"""Regenerate the Blender golden image (tests/data/teapot_blender.png).

Runs inside Blender (``blender --background --python
misc/prepare_blender_data.py``).  Camera matches the renderer's defaults:
distance 2.732, azimuth 90, elevation 0, lens/sensor ratio equal to the
30-degree viewing angle (lens 1.732, sensor 2 — tan(30deg) = 1/1.732), at
256x256 — the same protocol as the reference's
misc/prepare_blender_data.py:22-26,79-89.

The golden PNG is already checked in; this script exists so the fixture can
be regenerated / extended to new meshes.
"""

import math
import os
import sys

try:
    import bpy
except ImportError:
    sys.exit('run inside Blender: blender --background --python '
             'misc/prepare_blender_data.py')

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    '..', 'tests', 'data')


def run():
    # clean scene
    bpy.ops.object.select_all(action='SELECT')
    bpy.ops.object.delete()

    # teapot
    bpy.ops.wm.obj_import(filepath=os.path.join(DATA, 'teapot.obj'))

    # camera: distance 2.732 at azimuth 90 / elevation 0
    distance, azimuth, elevation = 2.732, math.radians(90), 0.0
    cam_data = bpy.data.cameras.new('cam')
    cam_data.lens = 1.732
    cam_data.sensor_width = 2.0
    cam_data.sensor_height = 2.0
    cam = bpy.data.objects.new('cam', cam_data)
    cam.location = (distance * math.cos(elevation) * math.sin(azimuth),
                    distance * math.sin(elevation),
                    -distance * math.cos(elevation) * math.cos(azimuth))
    # look at origin
    direction = cam.location
    rot_quat = direction.to_track_quat('Z', 'Y')
    cam.rotation_euler = rot_quat.to_euler()
    bpy.context.collection.objects.link(cam)
    bpy.context.scene.camera = cam

    scene = bpy.context.scene
    scene.render.resolution_x = 256
    scene.render.resolution_y = 256
    scene.render.resolution_percentage = 100
    scene.render.film_transparent = False
    scene.render.image_settings.file_format = 'PNG'
    scene.render.filepath = os.path.join(DATA, 'teapot_blender.png')
    bpy.ops.render.render(write_still=True)


if __name__ == '__main__':
    run()
