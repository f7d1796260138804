from gsjax.viewer.network_gui import NetworkGUI

__all__ = ["NetworkGUI"]
