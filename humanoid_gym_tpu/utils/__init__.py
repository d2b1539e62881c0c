"""CLI, checkpoint discovery, play-time logging utilities."""

from .helpers import get_args, get_load_path, class_to_dict, update_class_from_dict

__all__ = ["get_args", "get_load_path", "class_to_dict", "update_class_from_dict"]
