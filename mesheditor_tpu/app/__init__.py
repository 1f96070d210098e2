from .viewer import ViewerApp, serve

__all__ = ["ViewerApp", "serve"]
