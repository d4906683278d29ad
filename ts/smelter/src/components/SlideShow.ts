/**
 * SlideShow — renders one <Slide/> at a time, advancing when the current
 * slide's time-limited content (Mp4 durations, Show windows, nested
 * SlideShows) finishes; tracked through a per-slideshow keep-alive scope.
 *
 * Unlike a mutable cursor, the position is *derived*: each slide that
 * drains its scope gets its React key marked finished, and the slideshow
 * always renders the first un-finished slide. Edits to the child list
 * (insert/remove/reorder) therefore need no relocation bookkeeping —
 * already-played slides stay played, everything else keeps its turn.
 */
import type React from 'react';
import type { ReactElement } from 'react';
import { Children, createElement, useEffect, useState } from 'react';
import type { ComponentBaseProps } from '../scene.js';
import { KeepAlive } from '../runtime.js';
import { ScopeContext, useRetainUntil, useRetainWhile } from '../lifecycle.js';
import { useCurrentTimestamp } from '../hooks.js';
import View from './View.js';

export type SlideProps = Omit<ComponentBaseProps, 'id'> & {
  /** Slide duration; without it the slide lasts until its content finishes. */
  durationMs?: number;
};

export type SlideShowProps = {
  children: React.ReactNode;
};

type Keyed = { key: React.Key | null };

function slideKey(slide: React.ReactNode, position: number): React.Key {
  return (slide as Keyed).key ?? position;
}

export function SlideShow(props: SlideShowProps) {
  const deck = Children.toArray(props.children);
  const stray = deck.find(el => (el as ReactElement).type !== Slide);
  if (stray) {
    throw new Error('SlideShow component only accepts <Slide /> as children');
  }

  const [finished, setFinished] = useState<ReadonlySet<React.Key>>(() => new Set());
  const liveAt = deck.findIndex((el, i) => !finished.has(slideKey(el, i)));
  const live = liveAt >= 0 ? deck[liveAt] : undefined;

  // One scope per slideshow; the mounted slide's content retains it, and a
  // drain marks that slide's key as played.
  const [scope] = useState(() => new KeepAlive());
  useEffect(() => {
    if (live === undefined) return;
    const playedKey = slideKey(live, liveAt);
    // watch drain *transitions* only — during mount the snapshot is 0,
    // before the slide's own retain effects have registered
    return scope.pending.watch(() => {
      if (scope.idle()) {
        setFinished(prev => new Set(prev).add(playedKey));
      }
    });
  }, [scope, live, liveAt]);

  // keep the parent scope open while this deck still has slides to play
  useRetainWhile(live !== undefined);

  return createElement(
    ScopeContext.Provider,
    { value: scope },
    live ?? createElement(View, {})
  );
}

export function Slide(props: SlideProps) {
  const now = useCurrentTimestamp();
  const [shownAt] = useState(now);
  const [sealedScope] = useState(() => new KeepAlive());

  useRetainUntil(shownAt + (props.durationMs ?? 1000));

  if (props.durationMs) {
    // fixed duration: seal children into their own scope so their
    // lifetimes can't extend the slide
    return createElement(ScopeContext.Provider, { value: sealedScope }, props.children);
  }
  return props.children;
}
