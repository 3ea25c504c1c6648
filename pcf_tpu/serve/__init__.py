from pcf_tpu.serve.export import ServingModel, export_artifact

__all__ = ["ServingModel", "export_artifact"]
