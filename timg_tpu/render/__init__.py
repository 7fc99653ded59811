"""Host-side presentation: escape-stream assembly, layout, pacing.

  canvas.py    -- TerminalCanvas base: prefix coalescing, cursor moves
                  (ref: src/terminal-canvas.{h,cc})
  ansi.py      -- unicode block canvas: ANSI SGR assembly with run-length
                  color elision + inter-frame diff (ref: src/unicode-block-canvas.cc)
  sequencer.py -- BufferedWriteSequencer: bounded queue, pacing, skipping
                  (ref: src/buffered-write-sequencer.{h,cc})
  renderer.py  -- single/multi-column grid layout (ref: src/renderer.cc)
  png.py       -- fast PNG writer, Sub filter + zlib (ref: src/timg-png.cc)
  kitty.py     -- kitty graphics protocol (ref: src/kitty-canvas.cc)
  iterm2.py    -- iTerm2 OSC 1337 (ref: src/iterm2-canvas.cc)
  sixel_render.py -- sixel escape-stream assembly (ref behavior: libsixel
                  via src/sixel-canvas.cc)
"""
