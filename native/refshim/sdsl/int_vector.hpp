// int_vector.hpp — sdsl facade for the mumemto_tpu reference shim (see shim_core.hpp)
#pragma once
#include "shim_core.hpp"
