from .selective_scan import selective_scan
