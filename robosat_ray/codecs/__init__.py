"""Pure-numpy media codecs (no PIL/cv2/ffmpeg in this environment)."""
