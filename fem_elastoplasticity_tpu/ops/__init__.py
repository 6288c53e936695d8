from .elements import ElementType, volume_element, surface_element
