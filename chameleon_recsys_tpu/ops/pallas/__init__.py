from .ugrnn_pallas import ugrnn_scan_pallas

__all__ = ["ugrnn_scan_pallas"]
