from .video import VideoSiftFrontend, batched_sift, make_frames_mesh, sharded_sift_fn  # noqa: F401
