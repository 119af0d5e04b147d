"""Peripheral brightness nodes (hw/peripherals.py) — SIL tests.

Parity targets: scripts/conditional_brightness (v4l2 camera brightness
node) and scripts/lamp_brightness (GVM LED lamp node). The kernel/lamp
sides are injected: a fake ioctl answers the v4l2 requests with a real
struct layout, a recording transport captures lamp frames.
"""

import struct

import numpy as np
import pytest

from ealv_tpu.hw.peripherals import (
    _CONTROL_FMT, _QUERYCTRL_FMT, VIDIOC_G_CTRL, VIDIOC_QUERYCTRL,
    VIDIOC_S_CTRL, V4L2_CID_BRIGHTNESS, BrightnessNode, GVMLampDriver,
    V4L2BrightnessDriver,
)


class FakeV4L2Kernel:
    """Answers VIDIOC_* ioctls like a UVC camera with brightness 0..255."""

    def __init__(self, minimum=0, maximum=255, initial=128):
        self.minimum, self.maximum = minimum, maximum
        self.value = initial
        self.requests = []

    def opener(self, device, flags):
        self.device = device
        return 42  # fake fd

    def ioctl(self, fd, request, buf):
        assert fd == 42
        self.requests.append(request)
        if request == VIDIOC_QUERYCTRL:
            cid = struct.unpack(_QUERYCTRL_FMT, buf)[0]
            assert cid == V4L2_CID_BRIGHTNESS
            buf[:] = struct.pack(_QUERYCTRL_FMT, cid, 1, b"Brightness",
                                 self.minimum, self.maximum, 1, 128, 0, 0, 0)
        elif request == VIDIOC_S_CTRL:
            cid, val = struct.unpack(_CONTROL_FMT, buf)
            assert cid == V4L2_CID_BRIGHTNESS
            assert self.minimum <= val <= self.maximum
            self.value = val
        elif request == VIDIOC_G_CTRL:
            cid, _ = struct.unpack(_CONTROL_FMT, buf)
            buf[:] = struct.pack(_CONTROL_FMT, cid, self.value)
        else:  # pragma: no cover
            raise OSError(25, "bad ioctl")
        return 0


class TestV4L2Driver:
    def test_ioctl_codes_match_videodev2_abi(self):
        # linux/videodev2.h: _IOWR('V', 27/28/36, ...) on the 8/68-byte
        # structs. Literal values pin the ABI against regressions.
        assert VIDIOC_G_CTRL == 0xC008561B
        assert VIDIOC_S_CTRL == 0xC008561C
        assert VIDIOC_QUERYCTRL == 0xC0445624

    def test_range_query_and_set_get_roundtrip(self):
        k = FakeV4L2Kernel(minimum=10, maximum=210)
        drv = V4L2BrightnessDriver("/dev/video7", ioctl=k.ioctl,
                                   opener=k.opener)
        assert k.device == "/dev/video7"
        assert (drv.minimum, drv.maximum) == (10, 210)
        raw = drv.set(0.5)
        assert raw == 110 and k.value == 110
        assert abs(drv.get() - 0.5) < 1e-6

    def test_set_clips_to_unit_interval(self):
        k = FakeV4L2Kernel()
        drv = V4L2BrightnessDriver(ioctl=k.ioctl, opener=k.opener)
        assert drv.set(2.0) == 255  # reference clip, conditional_brightness:32
        assert drv.set(-1.0) == 0

    def test_queryctrl_failure_falls_back_to_reference_range(self):
        k = FakeV4L2Kernel()
        orig = k.ioctl

        def flaky(fd, request, buf):
            if request == VIDIOC_QUERYCTRL:
                raise OSError(25, "not supported")
            return orig(fd, request, buf)

        drv = V4L2BrightnessDriver(ioctl=flaky, opener=k.opener)
        assert (drv.minimum, drv.maximum) == (0, 255)


class TestGVMLamp:
    def test_surface_and_clips(self):
        frames = []
        lamp = GVMLampDriver(frames.append)
        lamp.turn_on()
        lamp.set_brightness(150)  # clips to 99 (lamp_brightness:18)
        assert lamp.brightness == 99
        lamp.set_brightness(0)
        assert lamp.brightness == 10
        lamp.set_cct(100)
        lamp.turn_off()
        assert not lamp.is_on
        assert len(frames) == 5
        assert all(f.startswith(b"EALV") for f in frames)


class TestBrightnessNode:
    def test_camera_node_updates_and_publishes(self):
        k = FakeV4L2Kernel()
        drv = V4L2BrightnessDriver(ioctl=k.ioctl, opener=k.opener)
        t = [0.0]
        node = BrightnessNode(drv, clock=lambda: t[0])
        assert k.value == 128  # initial 0.5 applied at construction
        node.update(0.8)
        assert k.value == int(round(0.8 * 255))
        b, stamp = node.publish()
        assert b == 0.8 and stamp == 0.0

    def test_lamp_power_hysteresis(self):
        frames = []
        lamp = GVMLampDriver(frames.append)
        node = BrightnessNode(lamp, off_below=0.1)
        assert lamp.is_on  # initial 0.5 >= threshold -> on
        node.update(0.05)
        assert not lamp.is_on  # below 10% -> off (lamp_brightness:38)
        node.update(0.07)
        assert not lamp.is_on  # still below: no spurious re-on
        node.update(0.5)
        assert lamp.is_on  # crossed back -> on before the write
        assert lamp.brightness == int(0.5 * 99)

    def test_serve_registers_reference_topic_surface(self):
        class _Msgs:
            class Float32:
                data = 0.0

            class BrightnessStamped:
                class header:
                    frame_id = ""
                    stamp = 0.0

                def __init__(self):
                    self.header = type("H", (), {})()

        class _Ros:
            def __init__(self):
                self.subs, self.timers, self.published = {}, [], []

            def init_node(self, name):
                self.node = name

            def Subscriber(self, topic, typ, cb):
                self.subs[topic] = cb

            def Publisher(self, topic, typ, queue_size=1):
                ros = self

                class _Pub:
                    def publish(self, msg, _t=topic):
                        ros.published.append((_t, msg))

                return _Pub()

            def Timer(self, period, cb):
                self.timers.append((period, cb))

        k = FakeV4L2Kernel()
        drv = V4L2BrightnessDriver(ioctl=k.ioctl, opener=k.opener)
        node = BrightnessNode(drv, clock=lambda: 7.0)
        ros = _Ros()
        node.serve(ros, _Msgs)
        assert "/update_brightness" in ros.subs
        period, tick = ros.timers[0]
        assert abs(period - 1 / 30.0) < 1e-9  # 30 Hz, :23
        msg = _Msgs.Float32()
        msg.data = 0.25
        ros.subs["/update_brightness"](msg)
        assert k.value == int(round(0.25 * 255))
        tick()
        topic, out = ros.published[0]
        assert topic == "/usb_cam/brightness"
        assert out.brightness == 0.25 and out.header.frame_id == "usb_cam"


class TestBridgeWiring:
    def test_native_bridge_applies_commanded_brightness(self):
        from ealv_tpu.hw.bridge import NativeBridge

        class _Drv:
            def state(self):
                return (np.zeros(6), np.zeros(6), np.zeros(6))

        k = FakeV4L2Kernel()
        cam = V4L2BrightnessDriver(ioctl=k.ioctl, opener=k.opener)
        node = BrightnessNode(cam, clock=lambda: 0.0)
        br = NativeBridge(driver=_Drv(), clock=lambda: 0.0,
                          brightness_node=node)
        br.klerg_cmd(np.zeros(6), brightness=0.9)
        assert k.value == int(round(0.9 * 255))
        br.klerg_cmd(np.zeros(6), brightness=-1.0)  # -1 = unchanged
        assert k.value == int(round(0.9 * 255))
