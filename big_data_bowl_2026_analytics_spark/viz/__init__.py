from .render import encode_bmp, render_play_frames

__all__ = ["encode_bmp", "render_play_frames"]
