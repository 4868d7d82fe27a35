from dirt_tpu.io.objloader import load_obj

__all__ = ["load_obj"]
